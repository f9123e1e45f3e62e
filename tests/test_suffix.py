"""Byte-level exact-substring dedup (suffix.py + the sharded Spark op)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from oxidizepdf_spark.suffix import (
    cross_doc_duplicate_coverage,
    lcp_array,
    suffix_array,
)


def test_suffix_array_matches_naive():
    rng = random.Random(1)
    for _ in range(200):
        n = rng.randrange(0, 80)
        b = bytes(rng.randrange(0, 5) for _ in range(n))
        sa = suffix_array(b).tolist()
        assert sa == sorted(range(n), key=lambda i: b[i:]), b


def test_lcp_matches_naive():
    rng = random.Random(2)
    for _ in range(100):
        n = rng.randrange(2, 60)
        b = bytes(rng.randrange(0, 4) for _ in range(n))
        sa = suffix_array(b)
        lcp = lcp_array(b, sa).tolist()
        for i in range(n - 1):
            a, c = b[sa[i]:], b[sa[i + 1]:]
            k = 0
            while k < min(len(a), len(c)) and a[k] == c[k]:
                k += 1
            assert lcp[i] == k, (b, i)


def test_lcp_long_runs_chunked_compare():
    b = b"A" * 5000 + b"B" + b"A" * 5000
    sa = suffix_array(b)
    lcp = lcp_array(b, sa)
    # suffix A^5000 (tail) vs A^5000 B A^5000 (head) share all 5000 A's
    assert int(lcp.max()) == 5000


def test_cross_doc_coverage_basic():
    A = b"the quick brown fox jumps over the lazy dog and runs away fast"
    B = b"prefix junk THE quick brown fox jumps over the lazy dog END bit"
    cov = cross_doc_duplicate_coverage([("a", A), ("b", B)], min_len=20)
    (s, e), = cov["a"]
    assert A[s:e] in B  # the shared run, verbatim, case-exact
    assert e - s >= 40


def test_whitespace_variant_caught_by_bytes_missed_by_word_grams():
    """The VERDICT r5 #6 'done' case: one word-boundary difference makes
    every 12-word window differ, so the word-gram stage sees nothing —
    the byte-level suffix array still finds the long shared run."""
    from oxidizepdf_spark.queries import SUBSTR_W

    C = "alphabeta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    D = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"

    def grams(text):
        ws = text.split()
        return {
            " ".join(ws[i : i + SUBSTR_W])
            for i in range(len(ws) - SUBSTR_W + 1)
        }

    assert not (grams(C) & grams(D))  # word-gram stage: zero windows
    cov = cross_doc_duplicate_coverage(
        [("c", C.encode()), ("d", D.encode())], min_len=40
    )
    assert cov["c"] and cov["d"]
    (s, e), = cov["c"]
    assert C.encode()[s:e] in D.encode()
    assert e - s >= 60  # nearly the whole shared tail


def test_intra_doc_repeat_does_not_inflate_cross_doc_span():
    """ADVICE r6 repro: doc A contains a 60-byte string twice, doc B
    shares only its 45-byte prefix. Each A copy must be credited 45
    bytes (the longest CROSS-document match), not 60 (the intra-A
    repeat) — total 90, not 120."""
    core = bytes(range(33, 93))  # 60 distinct printable-ish bytes
    assert len(core) == 60
    A = b"____" + core + b"####" + core + b"@@@@"
    B = b"~~~~" + core[:45] + b"!!!!"
    cov = cross_doc_duplicate_coverage([("a", A), ("b", B)], min_len=20)
    a_mass = sum(e - s for s, e in cov["a"])
    b_mass = sum(e - s for s, e in cov["b"])
    assert a_mass == 90, cov["a"]
    assert b_mass == 45, cov["b"]
    # and each credited A interval is exactly a 45-byte prefix of core
    for s, e in cov["a"]:
        assert A[s : s + 45] == core[:45]
        assert e - s == 45


def test_no_cross_separator_and_no_self_match():
    # identical text within ONE doc only: cross-doc scope reports nothing
    A = b"repeat this phrase " * 5
    B = b"completely different content with no sharing at all here"
    cov = cross_doc_duplicate_coverage([("a", A), ("b", B)], min_len=20)
    assert cov["a"] == [] and cov["b"] == []
    # intervals never cross document bounds
    C = b"x" * 30
    D = b"x" * 30
    cov2 = cross_doc_duplicate_coverage([("c", C), ("d", D)], min_len=20)
    for key, src in (("c", C), ("d", D)):
        for s, e in cov2[key]:
            assert 0 <= s < e <= len(src)
    assert cov2["c"] and cov2["d"]


def test_empty_and_tiny_inputs():
    assert cross_doc_duplicate_coverage([], 10) == {}
    assert cross_doc_duplicate_coverage([("a", b"")], 10) == {"a": []}
    assert suffix_array(b"").tolist() == []
    assert lcp_array(b"x", np.array([0])).tolist() == []


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(
        app_name="pytest-suffix", master="local[4]", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_cross_shard_duplicate_caught_by_word_gram_stage(spark, tmp_path):
    """The documented shard-locality residual (queries.py byte-op
    docstring): doc 0 and doc 1 land in DIFFERENT doc_id%32 shards, so
    the byte-level suffix-array stage cannot see their shared text —
    but the word-gram stage shuffles gram buckets GLOBALLY, so a
    word-aligned duplicate >= 12 words is still caught. A
    non-word-aligned variant (doc 65: one whitespace change) escapes
    both stages: the known residual, same as Lee et al.'s sharded
    tool."""
    import duckdb

    from oxidizepdf_spark.queries import (
        SUBSTR_BYTE_SHARDS,
        q_text_exact_substring_bytes,
        q_text_exact_substring_dedup,
    )

    shared = " ".join(f"word{i}" for i in range(20))  # 20 words, aligned
    rows = [
        (0, shared + " tail zero unique alpha"),
        (1, shared + " tail one unique beta"),  # shard 1 != shard 0
        # cross-shard AND non-word-aligned: 'word0 word1' -> 'word0word1'
        (65, shared.replace("word0 word1", "word0word1", 1)),
        (2, "totally unrelated filler content here nothing shared"),
    ]
    assert 0 % SUBSTR_BYTE_SHARDS != 1 % SUBSTR_BYTE_SHARDS
    assert 65 % SUBSTR_BYTE_SHARDS == 1 % SUBSTR_BYTE_SHARDS
    sf_dir = str(tmp_path)
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', 'en', 'test', {len(t)})" for i, t in rows
        )
        + ") t(doc_id, text, lang, source, n_chars)) TO "
        f"'{sf_dir}/documents.parquet' (FORMAT PARQUET)"
    )

    byte_rows = {
        r["doc_id"]: r
        for r in q_text_exact_substring_bytes(spark, sf_dir).collect()
    }
    gram_rows = {
        r["doc_id"]: r
        for r in q_text_exact_substring_dedup(spark, sf_dir).collect()
    }
    # byte stage: blind to the 0<->1 duplicate (different shards) and
    # 65's variant shares plenty of bytes with 1's copy IN-shard
    assert byte_rows[0]["dup_bytes"] == 0
    # word-gram stage: catches the word-aligned cross-shard duplicate
    assert gram_rows[0]["dup_windows"] > 0
    assert gram_rows[1]["dup_windows"] > 0
    assert gram_rows[2]["dup_windows"] == 0
    # the non-word-aligned variant doc 65 DOES match doc 1 byte-wise
    # in-shard (shards 1 and 1), proving the byte stage's role...
    assert byte_rows[65]["dup_bytes"] > 0 and byte_rows[1]["dup_bytes"] > 0
    # ...but had 65 been alone in its shard vs doc 0's shard, nothing
    # would catch it: its 12-word gram windows all differ from doc 0's
    # (the 'word0word1' fusion shifts every window) — gram stage sees
    # only its suffix overlap with 1/0 where windows realign
    assert byte_rows[2]["dup_bytes"] == 0


def test_sharded_spark_op(spark):
    """The distributed wrapper: every document reports, duplicated pairs
    land symmetric, shard isolation respected (cross-shard duplicates
    are invisible by design — the documented paper approximation)."""
    from oxidizepdf_spark.queries import (
        SUBSTR_BYTE_SHARDS,
        q_text_exact_substring_bytes,
    )

    rows = q_text_exact_substring_bytes(
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    n_docs = duckdb.sql(
        "SELECT COUNT(*) FROM '/root/testdata/sf0.001/documents.parquet'"
    ).fetchone()[0]
    assert len(rows) == n_docs
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert 0 <= r["dup_bytes"] <= r["n_bytes"]
        # dup coverage only ever pairs docs in the same shard
        if r["dup_bytes"]:
            assert any(
                o["dup_bytes"]
                for o in rows
                if o["doc_id"] != r["doc_id"]
                and o["doc_id"] % SUBSTR_BYTE_SHARDS
                == r["doc_id"] % SUBSTR_BYTE_SHARDS
            )
    assert by_id  # sanity
