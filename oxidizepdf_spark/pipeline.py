"""Spark pipeline: corpus table → extracted spans table (+ lineage metrics).

The Spark-first layer (SURVEY.md §2.8): documents are embarrassingly
parallel, so the only cross-node concerns are

- Arrow batch exchange into the Python workers (``mapInPandas``),
- salted repartitioning so skewed mega-PDFs don't serialize a task,
- per-partition lineage + metrics for checkpoint/resume,
- the resume anti-join that skips completed work.

Everything inside a task is the ``kernel`` package (no Spark imports there).

Mirrors at corpus scale what the reference's batch module does per-process
(oxidize-pdf-core/src/batch/mod.rs:72-268 worker pool → Spark scheduler).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernel.extract import extract_document_spans
from .kernel.textstate import ExtractionOptions
from .table_io import SPAN_STRUCT

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("ok", T.BooleanType()),
        T.StructField("mode", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("wall_ms", T.DoubleType()),
        T.StructField("task_partition", T.IntegerType()),
    ]
)

METRICS_SCHEMA = [
    "run_id",
    "part_id",
    "docs_in",
    "docs_ok",
    "docs_err",
    "spans_out",
    "bytes_in",
    "wall_ms",
    "mode",
    "error_sample",
]


def _extract_batches(
    batches: Iterator[pd.DataFrame], options: ExtractionOptions
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: the outer loop is one Arrow batch of documents;
    each document's parse stays in-kernel (SURVEY.md §1.2). Tolerant-mode
    errors surface as columns, never as task failures."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    task_partition = ctx.partitionId() if ctx is not None else -1
    for pdf_batch in batches:
        t0 = time.perf_counter()
        n = len(pdf_batch)
        doc_ids = pdf_batch["doc_id"].tolist()
        part_ids = (
            pdf_batch["part_id"].tolist() if "part_id" in pdf_batch else [0] * n
        )
        spans_col = pdf_batch["spans"].tolist()
        out = {
            "doc_id": doc_ids,
            "part_id": part_ids,
            "spans": [],
            "ok": [],
            "mode": [],
            "error": [],
            "n_pages": [],
            "n_spans": [],
            "bytes_in": [],
            "wall_ms": [],
            "task_partition": [task_partition] * n,
        }
        for in_spans in spans_col:
            t_doc = time.perf_counter()
            triples = [
                (s["kind"], s["text"], s["media_ref"])
                for s in (in_spans if in_spans is not None else [])
            ]
            try:
                spans, meta = extract_document_spans(triples, options)
            except Exception as e:  # absolute backstop: error-as-data
                spans, meta = [], {
                    "ok": False,
                    "error": f"kernel:{type(e).__name__}:{e}",
                    "mode": "strict",
                    "n_pages": 0,
                    "bytes_in": 0,
                }
            out["spans"].append(
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in spans
                ]
            )
            out["ok"].append(bool(meta["ok"]))
            out["mode"].append(meta["mode"])
            out["error"].append(meta["error"])
            out["n_pages"].append(int(meta["n_pages"]))
            out["n_spans"].append(len(spans))
            out["bytes_in"].append(int(meta["bytes_in"]))
            out["wall_ms"].append((time.perf_counter() - t_doc) * 1000.0)
        _ = t0
        yield pd.DataFrame(out)


def extract_spans(
    docs: DataFrame,
    options: ExtractionOptions | None = None,
    salt: bool = True,
    salt_partitions: int | None = None,
    mega_threshold_bytes: int = 2_000_000,
) -> DataFrame:
    """docs_raw → wide result frame (spans + per-doc lineage columns).

    ``salt=False`` skips the size-aware repartition — correct and ~2x
    faster when the corpus table is already bucketed by doc_id (the
    production layout: Iceberg ``bucket(doc_id)`` / parquet partitionBy,
    BENCH.md design notes). Keep the default for ad-hoc unbucketed inputs
    where one scan partition could hoard the mega-doc tail.

    Select ``doc_id, part_id, spans`` for the output table;
    ``metrics_from_results`` aggregates the lineage columns.
    """
    options = options or ExtractionOptions()
    prepared = (
        salt_by_size(docs, salt_partitions, mega_threshold_bytes) if salt else docs
    )
    return prepared.mapInPandas(
        lambda it: _extract_batches(it, options), schema=RESULT_SCHEMA
    )


def salt_by_size(
    docs: DataFrame,
    n_partitions: int | None = None,
    mega_threshold_bytes: int = 2_000_000,
) -> DataFrame:
    """Skew mitigation (SURVEY.md §2.8): normal docs shuffle on a
    hash(doc_id) salt; mega docs (payload above threshold) are round-robin
    spread so no task serializes several of them. No global ordering or
    window — scales to arbitrarily many partitions."""
    spark = docs.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sized = docs.withColumn(
        "_payload",
        F.expr("aggregate(spans, 0L, (acc, s) -> acc + length(coalesce(s.text, '')))"),
    )
    # ONE scan, one shuffle: normal docs salt on hash(doc_id); mega docs use
    # an independent hash family so their placement decorrelates from the
    # small-doc layout (two megas only collide by independent 1/N chance,
    # and the 64-doc Arrow batch cap bounds the damage). A filtered
    # two-branch union would scan the source twice — fatal at 100 TB.
    salt = F.when(
        F.col("_payload") <= mega_threshold_bytes,
        F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)),
    ).otherwise(F.pmod(F.xxhash64(F.lit("mega"), "doc_id"), F.lit(n_partitions)))
    return sized.repartition(n_partitions, salt).drop("_payload")


def metrics_from_results(results: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage/metrics table (FIXTURES.md §1.4), keyed by
    (run_id, part_id) — written beside the spans so a resumed run knows
    which partitions completed (reference analogue: batch progress
    callbacks, batch/mod.rs:102)."""
    return (
        results.groupBy("part_id")
        .agg(
            F.count("*").alias("docs_in"),
            F.sum(F.col("ok").cast("long")).alias("docs_ok"),
            F.sum((~F.col("ok")).cast("long")).alias("docs_err"),
            F.sum("n_spans").alias("spans_out"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum("wall_ms").alias("wall_ms"),
            F.max(F.when(F.col("mode") != "strict", F.col("mode")).otherwise(F.lit("strict"))).alias(
                "mode"
            ),
            F.first(F.col("error"), ignorenulls=True).alias("error_sample"),
        )
        .withColumn("run_id", F.lit(run_id))
        .select(*METRICS_SCHEMA)
    )


def resume_filter(docs: DataFrame, done_metrics: DataFrame | None) -> DataFrame:
    """Checkpoint resume: anti-join against completed partitions
    (SURVEY.md §2.8 'Resume'). ``done_metrics`` rows mark finished
    (run_id, part_id) units; docs in those partitions are skipped without
    recomputation. The join side is tiny (one row per partition) — Spark
    broadcasts it automatically under AQE."""
    if done_metrics is None:
        return docs
    done_parts = done_metrics.select("part_id").distinct()
    return docs.join(F.broadcast(done_parts), on="part_id", how="left_anti")


def run_extraction(
    docs: DataFrame,
    run_id: str,
    options: ExtractionOptions | None = None,
    done_metrics: DataFrame | None = None,
    salt: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full job: resume-filter → salt → extract → (spans_df, metrics_df)."""
    todo = resume_filter(docs, done_metrics)
    results = extract_spans(todo, options, salt=salt)
    spans = results.select("doc_id", "part_id", "spans")
    metrics = metrics_from_results(results, run_id)
    return spans, metrics
