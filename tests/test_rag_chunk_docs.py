"""rag_chunk_docs left the 50-row driver registry in round 7 (its slot
went to pdf_detect_corruption) but stays a supported operator — this test
keeps the exact Spark-vs-DuckDB differential the registry used to
provide. The underlying _chunk_windows_col operator is still
oracle-exercised every round inside training_corpus_pipeline."""

import duckdb
import pytest

from oxidizepdf_spark.queries import ORACLE_RAG_CHUNKS, q_rag_chunk_docs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(
        app_name="pytest-rag-chunks", master="local[4]", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_rag_chunk_docs_matches_oracle(spark):
    rows = q_rag_chunk_docs(spark, SF_DIR).collect()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        (r[0], r[1]): tuple(r[2:]) for r in con.sql(ORACLE_RAG_CHUNKS).fetchall()
    }
    got = {
        (r["doc_id"], r["chunk_id"]): tuple(r[2:]) for r in rows
    }
    assert got == want
    # shape sanity: every document chunks, overlapping windows in order
    assert len(got) >= len({k[0] for k in got})
