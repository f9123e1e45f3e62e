"""Byte-level exact-substring dedup: shard-local suffix arrays.

The word-gram operator (``q_text_exact_substring_dedup``, queries.py)
is the distributed, oracle-checkable projection of the Lee et al. 2022
exact-substring stage; this module supplies the paper-fidelity pass its
docstring names: a BYTE-level suffix array per shard that catches
cross-word-boundary and whitespace-variant duplicates the word-gram
hash can't see (reference analogue: the dedup pipeline the reference's
corpus tooling assumes; the technique is Lee et al. §3 and the
google-research/deduplicate-text-datasets implementation, which also
shards the corpus and builds one suffix array per shard).

Pure numpy: prefix-doubling suffix array (O(n log² n), ~vectorized) +
Kasai LCP, both exact. Shards of a few hundred MB are the production
unit (the paper used ~1/100th-corpus shards); the Spark wrapper in
queries.py groups by ``doc_id % K`` exactly like corpus_pack_sequences.

Known residual (same as the paper's sharded tool): this stage is
shard-local, so a duplicate split across two shards is invisible HERE.
Word-aligned cross-shard duplicates are still caught by the globally
shuffled word-gram stage; only non-word-aligned cross-shard variants
escape both stages (pinned + documented in tests/test_suffix.py).
"""

from __future__ import annotations

import numpy as np


def _sa_with_tables(
    s: np.ndarray,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Prefix-doubling suffix array plus the equality tables the
    vectorized LCP walk needs (optimization round 11; ~3x over the
    lexsort-per-round original).

    Two speedups, both exact:
    - the initial rank orders suffixes by their first FOUR bytes at once
      (base-257 packing: byte+1 per position, 0 = past-end so a short
      suffix sorts below every extension — the corpus concatenation
      contains real 0x00 separator bytes, so zero-PADDING would alias a
      data zero with end-of-string and one pair could never separate),
      skipping the two cheapest-but-still-O(n log n) doubling rounds;
    - each round sorts ONE composite int64 key (rank*(n+1) + tail+1)
      with argsort instead of a two-key lexsort.

    Returns (sa, tables) where tables[k] maps position -> a label whose
    equality is equivalent to equality of the k-byte window starting
    there (levels 1, 2, 4, then each doubling level); windows are only
    compared when fully in range, so the labels' end-handling never
    leaks into LCP values.
    """
    n = len(s)
    a = s.astype(np.int64) + 1
    w2 = a * 257
    w2[: n - 1] += a[1:]
    w4 = w2 * (257 * 257)
    w4[: n - 2] += w2[2:]
    tables = [(1, a), (2, w2), (4, w4)]
    order = np.argsort(w4, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    diff = np.empty(n, dtype=bool)
    diff[0] = True
    diff[1:] = w4[order[1:]] != w4[order[:-1]]
    rank[order] = np.cumsum(diff) - 1
    if rank[order[-1]] == n - 1:
        return order.astype(np.int64), tables
    k = 4
    while True:
        if k > 4 * n:  # unreachable with correct packing; fail loudly
            raise RuntimeError("suffix_array failed to converge")
        second = np.zeros(n, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:] + 1
        key = rank * (n + 1) + second
        order = np.argsort(key)
        new_rank = np.empty(n, dtype=np.int64)
        diff[0] = True
        diff[1:] = key[order[1:]] != key[order[:-1]]
        new_rank[order] = np.cumsum(diff) - 1
        rank = new_rank
        k *= 2
        tables.append((k, rank))
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64), tables


def suffix_array(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (Manber–Myers, numpy-vectorized).

    Returns int64 positions sorted by suffix. Exact for arbitrary bytes.
    """
    s = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return _sa_with_tables(s)[0]


def sa_and_lcp(data: bytes | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Suffix array + adjacent-suffix LCP in one pass, fully vectorized
    (optimization round 11): reuses the doubling rank tables to compute
    every adjacent LCP by a high-to-low walk over the levels — where the
    k-window labels agree, advance both suffixes by k — O(n log n) numpy
    with no per-byte Python loop (the Kasai implementation in
    ``lcp_array`` stays for API compatibility and differential tests).
    """
    s = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    sa, tables = _sa_with_tables(s)
    if n == 1:
        return sa, np.empty(0, dtype=np.int64)
    x = sa[:-1].copy()
    y = sa[1:].copy()
    h = np.zeros(n - 1, dtype=np.int64)
    for k, r in sorted(tables, key=lambda t: -t[0]):
        idx = np.flatnonzero((x + k <= n) & (y + k <= n))
        eq = np.zeros(n - 1, dtype=bool)
        eq[idx] = r[x[idx]] == r[y[idx]]
        h[eq] += k
        x[eq] += k
        y[eq] += k
    return sa, h


def lcp_array(data: bytes | np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai et al. LCP: lcp[i] = longest common prefix of suffixes
    sa[i] and sa[i+1] (length n-1). O(n) total extension work; the
    extension compares 64-byte slices first (C-speed bytes compare) so
    long duplicated runs don't pay a per-byte Python loop."""
    b = bytes(data) if not isinstance(data, (bytes, bytearray)) else bytes(data)
    n = len(b)
    if n <= 1:
        return np.empty(0, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    sa_l = sa.tolist()
    rank_l = rank.tolist()
    lcp = np.zeros(n - 1, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank_l[i]
        if r == n - 1:
            h = 0
            continue
        j = sa_l[r + 1]
        max_h = n - (i if i > j else j)
        while h + 64 <= max_h and b[i + h : i + h + 64] == b[j + h : j + h + 64]:
            h += 64
        while h < max_h and b[i + h] == b[j + h]:
            h += 1
        lcp[r] = h
        if h > 0:
            h -= 1
    return lcp


def _merge_intervals(iv: list[tuple[int, int]]) -> list[tuple[int, int]]:
    if not iv:
        return []
    iv.sort()
    out = [list(iv[0])]
    for s, e in iv[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [(s, e) for s, e in out]


def cross_doc_duplicate_coverage(
    texts: list[tuple[object, bytes]], min_len: int
) -> dict[object, list[tuple[int, int]]]:
    """Per-document byte intervals covered by substrings of length >=
    ``min_len`` that also occur in at least one OTHER document of the
    shard (the exact-substring cut mass, cross-document scope like the
    word-gram projection).

    Concatenates the shard's documents with 0x00 separators, builds one
    suffix array + LCP, groups maximal LCP>=min_len runs, and credits
    each suffix in a run spanning >= 2 distinct documents with the
    longest prefix it shares with a suffix from a DIFFERENT document
    (intra-document repeats longer than the cross-doc match do not
    inflate the credited span).
    Intervals are clamped to their document (a match can't credibly
    cross the separator: the cap also disarms the rare concat-order
    coincidence where separator-spanning text repeats).
    """
    if not texts:
        return {}
    parts = []
    bounds = []  # (start, end, doc_key)
    pos = 0
    for key, b in texts:
        parts.append(b)
        bounds.append((pos, pos + len(b), key))
        pos += len(b) + 1
        parts.append(b"\x00")
    data = b"".join(parts)[:-1] if parts else b""
    s = np.frombuffer(data, dtype=np.uint8)
    n = len(s)
    if n == 0:
        return {key: [] for key, _ in texts}
    sa, lcp = sa_and_lcp(s)
    starts = np.array([b[0] for b in bounds], dtype=np.int64)
    ends = np.array([b[1] for b in bounds], dtype=np.int64)
    # doc index per suffix position (separators belong to the preceding
    # doc's slot but get clamped to zero-length intervals)
    doc_of = np.searchsorted(starts, sa, side="right") - 1
    doc_end = ends[doc_of]

    out: dict[object, list[tuple[int, int]]] = {key: [] for key, _ in texts}
    # maximal runs of lcp >= min_len, found vectorized (r11: the former
    # per-element Python advance was an O(n) interpreted loop; qualifying
    # runs are rare, so only they pay Python time now)
    qual = np.concatenate(([False], lcp >= min_len, [False]))
    edges = np.flatnonzero(np.diff(qual.astype(np.int8)))
    run_starts = edges[0::2]
    run_ends = edges[1::2]  # exclusive in lcp index space
    for i, j in zip(run_starts.tolist(), run_ends.tolist()):
        # run of suffixes sa[i..j] sharing >= min_len prefixes pairwise
        block = slice(i, j + 1)
        docs_in = doc_of[block]
        if len(np.unique(docs_in)) >= 2:
            # Credit each suffix with its longest prefix shared with a
            # suffix from a DIFFERENT document — not its max adjacent
            # lcp, which may be an intra-document repeat longer than
            # anything actually cross-doc (a 60-byte string twice in A
            # plus a 45-byte prefix in B must credit A 45 per copy, not
            # 60). Pairwise LCP inside the run is the min of the lcp
            # values between the two suffixes, which is non-increasing
            # with distance, so the best cross-doc match is the nearest
            # different-doc neighbor in each direction: one O(run)
            # pass per direction with a running min.
            L = j + 1 - i
            d_run = docs_in
            # span_r[t]: min-lcp to the nearest different-doc suffix on
            # the right within the run (0 = none)
            span_r = [0] * L
            for t in range(L - 2, -1, -1):
                step = int(lcp[i + t])
                if d_run[t + 1] != d_run[t]:
                    span_r[t] = step
                elif span_r[t + 1]:
                    span_r[t] = min(step, span_r[t + 1])
            span_l = [0] * L
            for t in range(1, L):
                step = int(lcp[i + t - 1])
                if d_run[t - 1] != d_run[t]:
                    span_l[t] = step
                elif span_l[t - 1]:
                    span_l[t] = min(step, span_l[t - 1])
            for t in range(L):
                span = max(span_l[t], span_r[t])
                p = int(sa[i + t])
                d = int(doc_of[i + t])
                e = min(p + span, int(doc_end[i + t]))
                if e > p:
                    st, _en, key = bounds[d]
                    out[key].append((p - st, e - st))

    return {key: _merge_intervals(iv) for key, iv in out.items()}
