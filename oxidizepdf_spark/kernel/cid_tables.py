"""CID→Unicode collection tables (the reference's cid_to_unicode.rs).

The reference bundles Adobe's CMap-resource-derived tables (~17k entries per
collection, cid_to_unicode.rs: 10,001 LoC of static arrays) for the CNS1 /
GB1 / Japan1 / Korea1 collections. This module implements the *mechanism*
— sorted numpy arrays binary-searched with ``np.searchsorted``, the one
cross-task shared structure that maps to a Spark **broadcast variable**
(SURVEY.md §2.4 J3) — without vendoring Adobe's data: collections register
at runtime, either synthetically (tests) or by parsing Adobe's public
``cid2code.txt`` resource files via :func:`load_cid2code` when a deployment
ships them.

Decode semantics mirror extraction_cmap.rs decode_with_cid_table:646-669:
text bytes are big-endian u16 CIDs; unknown non-zero CIDs emit U+FFFD,
CID 0 emits nothing.
"""

from __future__ import annotations

import numpy as np


class CidCollection:
    """Sorted (cid → codepoint) table with binary-search lookup."""

    __slots__ = ("ordering", "_cids", "_unis")

    def __init__(self, ordering: str, pairs: dict[int, int]):
        self.ordering = ordering
        if pairs:
            cids = np.array(sorted(pairs), dtype=np.uint32)
            unis = np.array([pairs[int(c)] for c in cids], dtype=np.uint32)
        else:
            cids = np.empty(0, dtype=np.uint32)
            unis = np.empty(0, dtype=np.uint32)
        self._cids = cids
        self._unis = unis

    def cid_to_unicode(self, cid: int) -> str | None:
        """np.searchsorted lookup (the reference binary-searches its static
        arrays the same way)."""
        idx = int(np.searchsorted(self._cids, cid))
        if idx < len(self._cids) and int(self._cids[idx]) == cid:
            return chr(int(self._unis[idx]))
        return None

    def __len__(self) -> int:
        return len(self._cids)


_REGISTRY: dict[str, CidCollection] = {}

# the orderings the reference recognizes (cid_to_unicode.rs from_ordering)
KNOWN_ORDERINGS = ("CNS1", "GB1", "Japan1", "Korea1")


def register_collection(coll: CidCollection) -> None:
    _REGISTRY[coll.ordering] = coll


def from_ordering(ordering: str | None) -> CidCollection | None:
    """CidCollection::from_ordering (cid_to_unicode.rs:1-47). On a registry
    miss, lazily loads the bundled derived table (see tools/
    gen_cid_unicode.py: Adobe's BSD CMap resources composed with Python's
    CJK codecs — GB1/Japan1/Korea1). Returns None only when no table
    exists at all — the decode chain then falls through to the
    descendant's encoding decode, exactly like the reference when a CID
    has no table entry."""
    if ordering is None:
        return None
    coll = _REGISTRY.get(ordering)
    if coll is None and ordering not in _BUNDLED_TRIED:
        try:
            coll = _load_bundled(ordering)
        except OSError:
            # transient read error (fs hiccup under --py-files): do NOT
            # cache the failure — the next document retries the load
            return None
        # confirmed absent/corrupt → permanent miss for this process
        _BUNDLED_TRIED.add(ordering)
        if coll is not None:
            _REGISTRY[ordering] = coll
    return coll


_BUNDLED_TRIED: set = set()


def _load_bundled(ordering: str) -> CidCollection | None:
    """Load a derived table shipped in kernel/data/ (generated offline by
    tools/gen_cid_unicode.py from public BSD-licensed Adobe CMap data).

    Reads through importlib.resources so the tables also load when the
    package ships as a zip via ``spark-submit --py-files`` (plain
    ``__file__`` paths point inside the archive and os.path would miss).

    Raises OSError on a *transient* read failure (caller retries later);
    returns None only when the resource is confirmed absent or corrupt."""
    import gzip

    fname = f"cid_unicode_{ordering.lower()}.txt.gz"
    raw: bytes | None = None
    try:
        from importlib import resources

        ref = resources.files(__package__) / "data" / fname
        present = ref.is_file()
    except Exception:
        ref = None
        present = False
    if present:
        raw = ref.read_bytes()  # OSError here = transient → propagate
    if raw is None:
        # fallback for exotic loaders
        import os

        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", fname
        )
        if not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            raw = f.read()  # OSError = transient → propagate
    pairs: dict[int, int] = {}
    try:
        for line in gzip.decompress(raw).decode("ascii").splitlines():
            if line.startswith("#") or not line:
                continue
            cid_s, cp_s = line.split()
            pairs[int(cid_s)] = int(cp_s)
    except (OSError, ValueError):
        return None
    return CidCollection(ordering, pairs)


def decode_with_cid_table(text: bytes, coll: CidCollection) -> str:
    """extraction_cmap.rs:646-669: 2-byte BE CIDs → unicode; U+FFFD for
    unknown non-zero CIDs; CID 0 dropped."""
    out: list[str] = []
    i = 0
    n = len(text)
    while i + 1 < n:
        cid = (text[i] << 8) | text[i + 1]
        ch = coll.cid_to_unicode(cid)
        if ch is not None:
            out.append(ch)
        elif cid > 0:
            out.append("�")
        i += 2
    return "".join(out)


def load_cid2code(path: str, ordering: str, column: int = 1) -> CidCollection:
    """Parse an Adobe ``cid2code.txt`` resource file (tab-separated: CID then
    per-encoding code columns; '*' for absent). Ships with Adobe's public
    CMap resources — point this at them in deployments that need CJK."""
    pairs: dict[int, int] = {}
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b"#") or not line.strip():
                continue
            cols = line.split(b"\t")
            if len(cols) <= column:
                continue
            try:
                cid = int(cols[0])
                code = cols[column].strip()
                if code == b"*":
                    continue
                pairs[cid] = int(code.split(b",")[0], 16)
            except ValueError:
                continue
    coll = CidCollection(ordering, pairs)
    register_collection(coll)
    return coll


def broadcast_collections(spark):
    """Ship the registered collections to executors as a Spark broadcast —
    the cross-task analogue of the reference's static tables (SURVEY.md §4
    font/CMap cache row). Inside a UDF::

        colls = bc.value            # dict[ordering → (cids, unis)]
        register_from_arrays(colls) # rebuild registry executor-side
    """
    payload = {
        name: (coll._cids, coll._unis) for name, coll in _REGISTRY.items()
    }
    return spark.sparkContext.broadcast(payload)


def register_from_arrays(payload: dict) -> None:
    """Executor-side rebuild from broadcast_collections payload."""
    for name, (cids, unis) in payload.items():
        coll = CidCollection(name, {})
        coll._cids = cids
        coll._unis = unis
        _REGISTRY[name] = coll
