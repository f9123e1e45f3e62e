"""text_url_stats left the 50-row driver registry in round 7 (its slot
went to pdf_export_markdown) but stays a supported operator — this test
keeps the exact Spark-vs-DuckDB differential the registry used to
provide."""

import duckdb
import pytest

from oxidizepdf_spark.queries import ORACLE_URL_STATS, q_text_url_stats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(
        app_name="pytest-url-stats", master="local[4]", shuffle_partitions=4
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_url_stats_matches_oracle(spark):
    rows = q_text_url_stats(spark, SF_DIR).collect()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = {
        r[0]: (r[1], r[2]) for r in con.sql(ORACLE_URL_STATS).fetchall()
    }
    got = {r["host"]: (r["n_urls"], r["n_docs"]) for r in rows}
    assert got == want
    # sanity on shape: 20-host universe, every host aggregated once
    assert len(got) == 20
    assert all(n_urls >= n_docs for n_urls, n_docs in got.values())
