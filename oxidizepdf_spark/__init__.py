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

# Worker-boundary latency fixes (workerenv.py docstrings have the full
# story): PySpark re-validates every cached zipimporter per task (200-300
# ms of fixed latency per Python task until skipped for Spark's immutable
# runtime zips), and the daemon full-gc's the worker heap between tasks
# (~15 ms over the imported modules until frozen). Importing this package
# is the one step every Spark worker performs before running any of its
# functions, so both land exactly where needed without per-UDF
# boilerplate; the heap freeze applies only under the PySpark daemon.
from .workerenv import freeze_worker_heap as _freeze_worker
from .workerenv import neutralize_static_zip_invalidation as _neutralize_zip

_neutralize_zip()
_freeze_worker()
del _neutralize_zip, _freeze_worker
