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
