#!/usr/bin/env python3
"""Is the ~1.3s per-job fixed cost per-TASK (scales with task count) or
per-JOB? Compare noop-arrow and full extract at 128 tasks (current bench
layout) vs 32 tasks (one wave) at 32 cores."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import run_extract_job, stage_corpus  # noqa: E402
from oxidizepdf_spark.table_io import get_spark  # noqa: E402


def timeit(fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main():
    cores = 32
    n_docs = 150_000
    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = stage_corpus(spark, n_docs, seed=7)
    files = list(__import__("pathlib").Path(path).rglob("*.parquet"))
    total = sum(f.stat().st_size for f in files)

    run_extract_job(spark, n_docs, seed=7)
    run_extract_job(spark, n_docs, seed=7)

    def _noop(it):
        for b in it:
            yield b.slice(0, 1).select(["doc_id"])

    for ntasks in (128, 64, 32):
        per = max(total // ntasks, 1) + (1 << 14)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(per))
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        docs = spark.read.parquet(path)
        got = docs.rdd.getNumPartitions()
        noop_df = docs.mapInArrow(_noop, schema="doc_id string")
        t_noop = timeit(lambda: noop_df.agg({"doc_id": "max"}).collect())

        # inline extract (run_extract_job would reset maxPartitionBytes)
        from pyspark.sql import functions as F

        from oxidizepdf_spark.pipeline import extract_spans

        def full():
            extract_spans(docs, salt=False).agg(
                F.count("*"), F.sum("n_spans")
            ).collect()

        t_full = timeit(full, warm=1)
        print(f"tasks={got:4d}  noop={t_noop:.3f}s  full={t_full:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
