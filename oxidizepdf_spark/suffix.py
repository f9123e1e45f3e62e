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


def suffix_array(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (Manber–Myers, numpy-vectorized).

    Returns int64 positions sorted by suffix. Exact for arbitrary bytes.
    """
    s = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else data
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = s.astype(np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k] or -1); suffixes are distinct
        # strings, so ranks become fully distinct by k >= n and the
        # loop always terminates
        second = np.full(n, -1, dtype=np.int64)
        if k < n:
            second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.empty(n, dtype=np.int64)
        pair_diff = np.empty(n, dtype=bool)
        pair_diff[0] = True
        pair_diff[1:] = (rank[order[1:]] != rank[order[:-1]]) | (
            second[order[1:]] != second[order[:-1]]
        )
        new_rank[order] = np.cumsum(pair_diff) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order.astype(np.int64)
        k *= 2


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
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    starts = np.array([b[0] for b in bounds], dtype=np.int64)
    ends = np.array([b[1] for b in bounds], dtype=np.int64)
    # doc index per suffix position (separators belong to the preceding
    # doc's slot but get clamped to zero-length intervals)
    doc_of = np.searchsorted(starts, sa, side="right") - 1
    doc_end = ends[doc_of]

    out: dict[object, list[tuple[int, int]]] = {key: [] for key, _ in texts}
    m = len(lcp)
    i = 0
    while i < m:
        if lcp[i] < min_len:
            i += 1
            continue
        j = i
        while j < m and lcp[j] >= min_len:
            j += 1
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
        i = j + 1

    return {key: _merge_intervals(iv) for key, iv in out.items()}
