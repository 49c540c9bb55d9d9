"""Structured Streaming wrapper mirroring the reference daemon
(SURVEY §2.3-E, §3.1).

Reference flow (``Main.java``): P2P download → worker-pool convert →
synchronized rotated AvroWriter → onRotation GCS upload + BQ load, with
at-least-once retries and downstream SQL dedup.

Spark mapping:
- source: ``readStream`` over a drop directory (replayable file source —
  the P2P network source is out of engine scope, SURVEY §2.1 S1);
- trigger: ``processingTime = rotation period`` — Spark's micro-batch epoch
  IS the rotation window (AvroWriter.java:45-49 semantics);
- commit: ``foreachBatch`` appends each batch to a rotated table
  (Main.java:229-259's load job), idempotent via checkpointing + the
  downstream dedup (etl.sh:6-17 ↔ dropDuplicates);
- late/duplicate data: ``withWatermark + dropDuplicates`` (ST5/ST6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.rotation import with_window_id
from ..session import avro_supported


def read_block_stream(
    spark: SparkSession, drop_dir: str, schema, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-drop streaming source (replayable; backpressure via
    maxFilesPerTrigger — the reference's unbounded queue had none,
    ThreadHelpers.java:20-21)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def start_rotating_sink(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    rotation_seconds: int = 600,
    epoch_millis_col: str = "timestamp",
    processing_trigger: str | None = "1 second",
    dedup_key: str | None = None,
) -> StreamingQuery:
    """writeStream → foreachBatch rotated append (K1+K3 semantics).

    Each micro-batch appends into window_id-partitioned directories;
    checkpointing makes replays idempotent at the batch level, and the
    optional in-batch dedup mirrors the reference's tolerance for
    duplicate ingest (resolved downstream by dq06's window dedup).

    ``processing_trigger=None`` → availableNow (drain-and-stop, for tests
    and backfills); a duration string → continuous micro-batches whose
    period IS the reference's rotation cadence.

    Output format is Avro either way (AvroWriter.java parity): the
    spark-avro DataSource when present, else the engine's own OCF writer
    (sources/avro_io.py) with file names keyed by micro-batch id — a
    replayed batch rewrites its own files, keeping at-least-once commits
    idempotent.
    """
    native_avro = avro_supported(stream.sparkSession)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if dedup_key is not None:
            out = out.dropDuplicates([dedup_key])
        wdf = with_window_id(out, epoch_millis_col, rotation_seconds)
        if native_avro:
            (
                wdf.write.mode("append")
                .partitionBy("window_id")
                .format("avro")
                .save(out_path)
            )
        else:
            from ..sources.avro_io import write_ocf_dataset

            write_ocf_dataset(
                wdf,
                out_path,
                partition_col="window_id",
                suffix=f"-b{batch_id:05d}",
            )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint
    )
    if processing_trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_trigger)
    return writer.start()
