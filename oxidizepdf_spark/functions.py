"""SQL-facing function surface: register the extraction kernels as Spark
SQL functions so ``spark.sql(...)`` users can call the engine directly.

    from oxidizepdf_spark.functions import register_sql_functions
    register_sql_functions(spark)
    spark.sql("SELECT doc_id, oxpdf_extract_text(pdf_bytes) FROM corpus")

All functions are Arrow-batched pandas UDFs (vectorized transport; the
per-document kernel runs inside, same as the pipeline). Registered names:

- ``oxpdf_extract_text(binary) -> string``      full-document text
- ``oxpdf_page_count(binary) -> int``           page count (0 on error)
- ``oxpdf_metadata_json(binary) -> string``     metadata dict as JSON
- ``oxhtml_main_content(string) -> string``     HTML boilerplate strip

UDF objects are built lazily (pandas_udf validates against a live session,
so module import must stay session-free for --py-files shipping).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import SparkSession


def _fn_extract_text(data: pd.Series) -> pd.Series:
    from .kernel.extract import extract_pdf_bytes

    out = []
    for blob in data:
        if blob is None:
            out.append(None)
            continue
        res = extract_pdf_bytes(bytes(blob))
        # document text = pages joined with \n (reference extract_text
        # page loop). Within a page, concatenation of kind='text' spans
        # equals the page text — do NOT join spans with \n, or documents
        # with interleaved image spans gain newlines the reference never
        # produces.
        out.append("\n".join(res.page_texts))
    return pd.Series(out, dtype=object)


def _fn_page_count(data: pd.Series) -> pd.Series:
    from .kernel.extract import extract_pdf_bytes

    return pd.Series(
        [0 if b is None else extract_pdf_bytes(bytes(b)).n_pages for b in data]
    )


def _fn_metadata_json(data: pd.Series) -> pd.Series:
    from .kernel.extract import extract_metadata

    out = []
    for blob in data:
        if blob is None:
            out.append(None)
            continue
        out.append(json.dumps(extract_metadata(bytes(blob)), sort_keys=True))
    return pd.Series(out, dtype=object)


def _fn_html_main_content(data: pd.Series) -> pd.Series:
    from .kernel.html_extract import extract_html_spans

    out = []
    for html in data:
        if html is None:
            out.append(None)
            continue
        spans = extract_html_spans(html)
        # HTML text spans are whole block segments (already stripped, never
        # split mid-block by an image span), so newline-joining blocks is
        # the faithful main-content text — unlike the PDF leg above.
        out.append("\n".join(s[1] for s in spans if s[0] == "text"))
    return pd.Series(out, dtype=object)


def build_udfs() -> dict:
    """Name → pandas UDF, built against the active session."""
    from pyspark.sql.functions import pandas_udf

    return {
        "oxpdf_extract_text": pandas_udf(_fn_extract_text, "string"),
        "oxpdf_page_count": pandas_udf(_fn_page_count, "int"),
        "oxpdf_metadata_json": pandas_udf(_fn_metadata_json, "string"),
        "oxhtml_main_content": pandas_udf(_fn_html_main_content, "string"),
    }


def register_sql_functions(spark: SparkSession) -> dict:
    """Register all engine functions on the session (idempotent). Returns
    the UDF objects for DataFrame-API use."""
    udfs = build_udfs()
    for name, udf in udfs.items():
        spark.udf.register(name, udf)
    return udfs
