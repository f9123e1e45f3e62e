"""Lazy in-repo C-extension build for the content-stream fast path.

The kernel ships ``_cscan.c`` (a transcription of ``parse_and_run``'s
fused fast loop — see content.py — into C using the CPython API) and
compiles it ON FIRST IMPORT with the host toolchain:

    gcc -O2 -shared -fPIC _cscan.c -o <cache>/_cscan-<tag>.so

This is the same deploy-anywhere story a 1000-executor cluster needs: the
source rides with the package (``--py-files``), each executor compiles
once into a local cache keyed by (source hash, python version), and ANY
failure — no compiler, no headers, sandboxed filesystem — degrades to the
pure-Python loop with identical semantics (the parse_and_run ==
run∘parse_content differential pins cover both paths).

Kill switch: ``OXPDF_NO_CKERNEL=1`` forces pure Python.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "oxidizepdf_spark")


def _write_failed_sentinel(path: str) -> None:
    try:
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write("compile failed\n")
        os.replace(tmp, path)
    except OSError:
        pass


def load_cscan():
    """Compile (if needed) and import the _cscan extension; None on any
    failure — callers fall back to the pure-Python loop."""
    if os.environ.get("OXPDF_NO_CKERNEL"):
        return None
    # importlib.resources reads the source even when the package ships as a
    # zip (spark-submit --py-files oxidizepdf_spark.zip) — a plain
    # __file__-relative open() would fail there and silently lose the fast
    # path on every executor.
    try:
        from importlib import resources

        source = (
            resources.files("oxidizepdf_spark.kernel") / "_cscan.c"
        ).read_bytes()
    except Exception:
        try:
            src = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "_cscan.c"
            )
            with open(src, "rb") as f:
                source = f.read()
        except OSError:
            return None
    tag = hashlib.sha256(
        source + sys.version.encode() + sys.executable.encode()
    ).hexdigest()[:16]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"_cscan-{tag}.so")
    # negative cache: without it, every new Python process on a host with a
    # broken toolchain re-runs the gcc attempt (up to the 120s timeout)
    # before degrading — a sentinel makes the failure a one-time cost per
    # host; the source-hash tag invalidates it on the next kernel change
    failed_path = os.path.join(cache, f"_cscan-{tag}.failed")
    if not os.path.exists(so_path):
        if os.path.exists(failed_path):
            return None
        try:
            os.makedirs(cache, exist_ok=True)
            include = sysconfig.get_paths()["include"]
            cc = os.environ.get("CC", "gcc")
            # compile from a cache-local copy of the source: the package
            # may be a zip with no on-disk .c path for gcc to read
            csrc = os.path.join(cache, f"_cscan-{tag}.c")
            if not os.path.exists(csrc):
                tmp_c = csrc + f".tmp.{os.getpid()}"
                with open(tmp_c, "wb") as f:
                    f.write(source)
                os.replace(tmp_c, csrc)
            tmp = so_path + f".tmp.{os.getpid()}"
            proc = subprocess.run(
                [
                    cc, "-O2", "-fPIC", "-shared", "-fno-strict-aliasing",
                    f"-I{include}", csrc, "-o", tmp,
                ],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode != 0:
                # a real compiler rejection is deterministic for this
                # source hash — cache the negative permanently
                _write_failed_sentinel(failed_path)
                return None
            os.replace(tmp, so_path)  # atomic vs concurrent executors
        except (subprocess.TimeoutExpired, OSError):
            # transient causes (gcc timeout under host load, ENOSPC, a
            # killed subprocess): do NOT poison the negative cache — the
            # next process should retry the compile
            return None
        except Exception:
            _write_failed_sentinel(failed_path)
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("oxpdf_cscan", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None
