"""blockchaintoavro_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``cobookman/blockchainToAvro``.

The reference is a GCP batch/streaming ETL pipeline (Bitcoin blocks → Avro →
BigQuery) whose querying is delegated to BigQuery. This package re-expresses
that surface Spark-first:

- ``sources/``   — file/table/CSV sources (reference: Avro files, bq load,
  wget'd CSVs) and the deterministic blocks fixture generator.
- ``operators/`` — the reference's own operators (dedup-by-window, array
  flatten ETL, rotated time-window sink) plus the extended LLM-data-pipeline
  operators (dedup family, similarity search, text analysis, multimodal).
- ``functions/`` — column-expression helpers (value-or-error pairs, vector
  math, text metrics) — all JVM-side ``pyspark.sql.functions`` compositions.
- ``plans/``     — the declared-query registry (SURVEY.md §2.4): one PySpark
  builder + one DuckDB oracle SQL per query; this is the correctness contract.
- ``streaming/`` — Structured Streaming wrapper mirroring the reference
  daemon (rotation-triggered micro-batches, foreachBatch commit).

Everything is DataFrame/Catalyst-native; Python UDFs appear only where no
built-in expression exists, and then as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"


def _patch_zipimport_invalidate() -> None:
    """Backport CPython 3.13's cheap ``zipimporter.invalidate_caches``.

    PySpark's worker loop calls ``importlib.invalidate_caches()`` once per
    TASK (``pyspark/worker_util.py:setup_spark_files``). On CPython < 3.13
    ``zipimport.zipimporter.invalidate_caches`` unconditionally re-parses
    the archive's whole central directory, and the worker's
    ``sys.path_importer_cache`` holds one zipimporter per (archive, package
    prefix) ever imported — pyspark.zip alone contributes a dozen. Measured
    in-worker on this sandbox: **~122 ms of pure-Python CPU per task**,
    ~0.2 CPU-s/task total boundary overhead, 73% of all worker samples —
    for every Arrow/pandas stage of every query, dwarfing small UDF bodies
    (x_jpeg_decode: 21 of 27 CPU-s were this tax + the sort's re-execution,
    not the codec). CPython 3.13 fixed it by making invalidation lazy
    (gh-87319 lineage); this shim keeps 3.11/3.12 semantics for genuinely
    modified archives (mtime/size change → full re-read) and skips the
    re-parse when the archive is provably unchanged. Installed at package
    import, so every Spark worker that runs one of this engine's Arrow
    stages self-heals from the second task on; guide §4 (the Python
    boundary) motivates the fix.
    """
    import sys

    if sys.version_info >= (3, 13):
        return
    import os
    import zipimport

    orig = zipimport.zipimporter.invalidate_caches
    if getattr(orig, "_graft_mtime_guarded", False):
        return

    def invalidate_caches(self):  # noqa: ANN001 — stdlib signature
        try:
            st = os.stat(self.archive)
            stamp = (st.st_mtime_ns, st.st_size)
        except OSError:
            stamp = None
        if stamp is not None and getattr(self, "_graft_toc_stamp", None) == stamp:
            return
        orig(self)
        if stamp is not None:
            self._graft_toc_stamp = stamp

    invalidate_caches._graft_mtime_guarded = True
    invalidate_caches.__doc__ = orig.__doc__
    zipimport.zipimporter.invalidate_caches = invalidate_caches


_patch_zipimport_invalidate()
