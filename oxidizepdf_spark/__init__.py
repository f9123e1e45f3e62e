"""oxidizepdf_spark — a PySpark-native PDF content-extraction engine.

A from-scratch reimplementation of the *parse path* of the reference
library bzsanti/oxidizePdf (pure Rust, /root/reference) as a Spark-first
pipeline: the per-document PDF object graph, filters, tokenizers and the
text-state interpreter live inside vectorized pandas/Arrow UDF kernels
(``oxidizepdf_spark.kernel``), while corpus-level concerns — partition
pruning, salted repartitioning for skewed mega-PDFs, lineage + metrics,
checkpoint/resume — are expressed with the DataFrame API
(``oxidizepdf_spark.pipeline``).

Input/output data model (BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

The engine consumes interleaved text+media documents (a ``raw_pdf`` span
carries the PDF bytes; ``text``/``media`` spans pass through) and emits
the extracted span sequence with per-row span-sequence equality
(kind, text, media_ref, order) against the reference's behavior.
"""

__version__ = "0.1.0"
