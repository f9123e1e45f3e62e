"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full extraction pipeline over an interleaved
corpus synthesized from sf0.001 documents (lead-in text + raw PDF + media
spans per doc), returning the flattened span rows.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (SURVEY.md §2 + training-data ops); the driver compares each Spark
result against its DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from oxidizepdf_spark.queries import q_pdf_extract_spans_flat

    return q_pdf_extract_spans_flat(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2.

    pdf_extract_* queries build synthetic PDFs from the documents table
    inside Arrow-batched UDFs and run the full kernel parse path; the rest
    are corpus-level training-data ops (dedup, ANN, text analysis).
    """
    from oxidizepdf_spark.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-executable ANSI SQL equivalents, keyed identically."""
    from oxidizepdf_spark.queries import build_oracles

    return build_oracles()
