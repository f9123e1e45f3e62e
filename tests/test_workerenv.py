"""workerenv: the static-Spark-zip invalidate_caches neutralization.

The patch removes 200-300 ms of per-task latency from every Python-boundary
stage (see oxidizepdf_spark/workerenv.py). These tests pin:

- the patch is active after importing the package (the worker bootstrap path),
- the filter ONLY skips Spark's immutable runtime archives — a user zip on
  sys.path still re-reads its directory, so ``sc.addPyFile``-style dynamic
  code keeps stock semantics,
- the patch is live inside actual Spark workers.
"""

from __future__ import annotations

import importlib
import os
import sys
import zipfile
import zipimport

import pytest

import oxidizepdf_spark  # noqa: F401 — applies the patch at import
from oxidizepdf_spark import workerenv


def test_patch_active_after_package_import():
    assert zipimport.zipimporter.invalidate_caches.__module__ == (
        "oxidizepdf_spark.workerenv"
    )


def test_static_archive_predicate():
    assert workerenv._is_static_spark_archive("/opt/spark/python/lib/pyspark.zip")
    assert workerenv._is_static_spark_archive("/x/y/py4j-0.10.9.9-src.zip")
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        assert workerenv._is_static_spark_archive(
            os.path.join(spark_home, "python", "lib", "anything.zip")
        )
    assert not workerenv._is_static_spark_archive("/tmp/user_code.zip")


def test_user_zip_still_invalidates(tmp_path):
    """A non-Spark zip added to sys.path must still pick up new members
    after importlib.invalidate_caches() — stock CPython semantics."""
    zpath = tmp_path / "user_code.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("wenv_mod_a.py", "VALUE = 1\n")
    sys.path.insert(0, str(zpath))
    try:
        import wenv_mod_a  # noqa: F401 — caches a zipimporter for zpath

        assert wenv_mod_a.VALUE == 1
        with zipfile.ZipFile(zpath, "a") as z:
            z.writestr("wenv_mod_b.py", "VALUE = 2\n")
        importlib.invalidate_caches()
        import wenv_mod_b

        assert wenv_mod_b.VALUE == 2
    finally:
        sys.path.remove(str(zpath))
        sys.modules.pop("wenv_mod_a", None)
        sys.modules.pop("wenv_mod_b", None)


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_KEEP_ZIP_INVALIDATION", "1")
    workerenv.restore_zip_invalidation()
    try:
        assert workerenv.neutralize_static_zip_invalidation() is False
        assert zipimport.zipimporter.invalidate_caches is (
            workerenv._ORIG_INVALIDATE
        )
    finally:
        monkeypatch.delenv("SPARK_GRAFT_KEEP_ZIP_INVALIDATION")
        assert workerenv.neutralize_static_zip_invalidation() is True


@pytest.fixture(scope="module")
def spark():
    from oxidizepdf_spark.table_io import get_spark

    s = get_spark(app_name="pytest-workerenv", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_patch_lands_in_spark_workers(spark):
    """After one task that unpickles a package function, the worker's
    zipimport is patched and its import-time heap frozen (worker reuse
    keeps both for later tasks)."""
    import pyarrow as pa

    def probe(batches):
        # importing the package is what real worker functions cause; do it
        # explicitly so the probe does not depend on closure capture
        import gc
        import zipimport as zi

        import oxidizepdf_spark  # noqa: F401

        for _ in batches:
            pass
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([zi.zipimporter.invalidate_caches.__module__]),
                pa.array([gc.get_freeze_count()], type=pa.int64()),
            ],
            names=["mod", "frozen"],
        )

    df = spark.range(8, numPartitions=2)
    rows = df.mapInArrow(probe, schema="mod string, frozen long").collect()
    assert {r.mod for r in rows} == {"oxidizepdf_spark.workerenv"}
    assert all(r.frozen > 0 for r in rows)


def test_heap_freeze_skipped_in_driver():
    """The driver process (no pyspark.daemon) must never be frozen by the
    package import."""
    import gc

    import oxidizepdf_spark  # noqa: F401 — already imported at module top

    assert gc.get_freeze_count() == 0
    assert workerenv.freeze_worker_heap() is False
