"""Physical-plan hygiene (the '.explain and iterate' discipline): column
pruning reaches the parquet scan, small sides broadcast, whole-stage codegen
covers the JVM-side analytics."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(app_name="pytest-plans", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_roundtrip_scan_prunes_columns(spark):
    """The extraction UDF only needs doc_id+text; lang/source/n_chars must
    not be read (ReadSchema shows the pruned projection)."""
    from oxidizepdf_spark.queries import build_queries

    df = build_queries()["pdf_extract_flate"](spark, SF)
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "text" in scan[0]
    assert "lang" not in scan[0] and "source" not in scan[0]


def test_ann_uses_broadcast_join(spark):
    from oxidizepdf_spark.queries import q_ann_cosine_topk

    plan = _plan(q_ann_cosine_topk(spark, SF))
    assert "Broadcast" in plan  # query set broadcast, not shuffled


def test_resume_anti_join_is_broadcast(spark):
    from oxidizepdf_spark.pipeline import resume_filter
    from oxidizepdf_spark.table_io import DOCS_SCHEMA

    docs = spark.createDataFrame([], schema=DOCS_SCHEMA)
    done = spark.createDataFrame([(1,)], "part_id int")
    plan = _plan(resume_filter(docs, done))
    assert "Broadcast" in plan and ("LeftAnti" in plan or "Anti" in plan)


def test_token_count_whole_stage_codegen(spark):
    """Pure-JVM analytics stay inside WholeStageCodegen (no Python in the
    hot path)."""
    from oxidizepdf_spark.queries import q_text_token_count

    plan = _plan(q_text_token_count(spark, SF))
    # '*(n)' node prefixes mark whole-stage-codegen spans in executedPlan
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_events_agg_partial_before_shuffle(spark):
    """groupBy must plan a map-side partial aggregate before the exchange."""
    from oxidizepdf_spark.queries import q_corpus_events_stats

    plan = _plan(q_corpus_events_stats(spark, SF))
    assert "partial" in plan.lower()
    assert "Exchange" in plan
