#!/usr/bin/env python3
"""Derive CID→Unicode tables from Adobe's BSD-licensed CMap resources +
Python's bundled CJK codecs, and write them as compact data files the
kernel loads at runtime (kernel/cid_tables.py `load_bundled`).

Method (no vendored third-party code, data only):

1. Parse a predefined encoding CMap (begincidrange/begincidchar sections)
   → the byte-code → CID mapping Adobe publishes under BSD-3
   (cmap-resources; the reference bundles the same files under
   src/text/cmap_resources/ with LICENSE.md).
2. Invert it: CID → encoded bytes.
3. Decode those bytes with Python's bundled codec for the national
   encoding (gbk / cp932 / cp949) → CID → Unicode.

This covers every CID reachable through the national encoding — the
practical repertoire for Identity-H documents in these collections. The
reference instead generates from Adobe's cid2code.txt (needs network);
same facts, different public source.

Usage: python tools/gen_cid_unicode.py [cmap_resources_dir]
Writes: oxidizepdf_spark/kernel/data/cid_unicode_<ordering>.txt.gz
        (lines "cid unicode_codepoint", both decimal, sorted by cid)
"""

from __future__ import annotations

import gzip
import os
import re
import sys

# (cmap_file, ordering, python_codec)
SOURCES = [
    ("GBK-EUC-H", "GB1", "gbk"),
    ("90ms-RKSJ-H", "Japan1", "cp932"),
    ("KSCms-UHC-H", "Korea1", "cp949"),
]

_RANGE = re.compile(
    rb"begincidrange(.*?)endcidrange", re.S
)
_CHAR = re.compile(rb"begincidchar(.*?)endcidchar", re.S)
_PAIR3 = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\d+)")
_PAIR2 = re.compile(rb"<([0-9A-Fa-f]+)>\s*(\d+)")


def code_to_cid_pairs(cmap_bytes: bytes):
    """Yield (code_bytes, cid) for every mapping in the CMap."""
    for section in _RANGE.findall(cmap_bytes):
        for lo_h, hi_h, cid0 in _PAIR3.findall(section):
            nbytes = len(lo_h) // 2
            lo = int(lo_h, 16)
            hi = int(hi_h, 16)
            cid0 = int(cid0)
            for off in range(hi - lo + 1):
                yield (lo + off).to_bytes(nbytes, "big"), cid0 + off
    for section in _CHAR.findall(cmap_bytes):
        for code_h, cid in _PAIR2.findall(section):
            nbytes = len(code_h) // 2
            yield int(code_h, 16).to_bytes(nbytes, "big"), int(cid)


def derive(cmap_path: str, codec: str) -> dict[int, int]:
    data = open(cmap_path, "rb").read()
    table: dict[int, int] = {}
    for code, cid in code_to_cid_pairs(data):
        if cid in table:
            continue  # first (H-order) mapping wins
        try:
            s = code.decode(codec)
        except (UnicodeDecodeError, LookupError):
            continue
        if len(s) != 1:
            continue
        cp = ord(s)
        if cp < 0x20:
            continue
        table[cid] = cp
    return table


def main() -> None:
    src_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/oxidize-pdf-core/src/text/cmap_resources"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "oxidizepdf_spark",
        "kernel",
        "data",
    )
    os.makedirs(out_dir, exist_ok=True)
    for fname, ordering, codec in SOURCES:
        path = os.path.join(src_dir, fname)
        if not os.path.isfile(path):
            print(f"skip {ordering}: {path} not found")
            continue
        table = derive(path, codec)
        out = os.path.join(out_dir, f"cid_unicode_{ordering.lower()}.txt.gz")
        with gzip.open(out, "wt") as f:
            f.write(
                f"# CID->Unicode for Adobe-{ordering}, derived from the "
                f"BSD-licensed Adobe CMap resource {fname} (code->CID) "
                f"composed with Python codec '{codec}' (code->Unicode).\n"
                f"# Source data: (c) Adobe, BSD-3-Clause "
                f"(github.com/adobe-type-tools/cmap-resources).\n"
            )
            for cid in sorted(table):
                f.write(f"{cid} {table[cid]}\n")
        print(f"{ordering}: {len(table)} entries -> {out}")


if __name__ == "__main__":
    main()
