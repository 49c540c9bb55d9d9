"""Rotated time-window file sink (SURVEY §2.1 K1, DQ-24).

Reference: ``AvroWriter.java:17-88`` — a single synchronized writer appends
records to a file named by timestamp; when the processing-time tumbling
window id ``epochSeconds / rotationTime`` changes (:45-49, checked per
write :39-41), the file closes and a callback uploads it
(``Main.java:204-259``).

Spark-first: the window id is a partition column; ``partitionBy`` writes
one directory per window with per-partition parallel writers — the
reference's global writer lock (:38) disappears entirely. Format: the
spark-avro DataSource when present; otherwise REAL Avro object container
files via the engine's own OCF codec (sources/avro_io.py — validated
against the official Avro Java library), written distributed with the same
``window_id=N/part-*.avro`` layout. No silent parquet downgrade.

Scale: the write is a narrow map + partitioned commit; directories are the
commit unit exactly like the reference's per-file upload, and Spark's
FileCommitProtocol gives atomic visibility the reference approximates with
retries (×3 record, ×5 upload — Main.java:189-202).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import avro_supported


def with_window_id(
    df: DataFrame,
    epoch_millis_col: str = "timestamp",
    rotation_seconds: int = 600,
    out_col: str = "window_id",
) -> DataFrame:
    """window id = epochSeconds / rotationTime (AvroWriter.java:45-49)."""
    return df.withColumn(
        out_col,
        F.expr(f"({epoch_millis_col} DIV 1000) DIV {rotation_seconds}"),
    )


def write_rotated(
    df: DataFrame,
    path: str,
    epoch_millis_col: str = "timestamp",
    rotation_seconds: int = 600,
    mode: str = "overwrite",
    suffix: str = "",
) -> str:
    """Write one Avro directory per rotation window; returns format used.

    ``suffix`` disambiguates file names for append-style callers (the
    streaming sink passes its micro-batch id, so a replayed batch
    overwrites its own files — idempotent at-least-once commits)."""
    import shutil

    spark = df.sparkSession
    wdf = with_window_id(df, epoch_millis_col, rotation_seconds)
    if avro_supported(spark):
        (
            wdf.write.mode(mode)
            .partitionBy("window_id")
            .format("avro")
            .save(path)
        )
        return "avro"
    from ..sources.avro_io import write_ocf_dataset

    if mode == "overwrite":
        shutil.rmtree(path, ignore_errors=True)
    write_ocf_dataset(wdf, path, partition_col="window_id", suffix=suffix)
    return "avro-ocf"


def read_rotated(spark: SparkSession, path: str) -> DataFrame:
    """Re-read a rotated dataset (window_id recovered as partition col)."""
    if avro_supported(spark):
        return spark.read.format("avro").load(path)
    from ..sources.avro_io import read_ocf_dataset

    return read_ocf_dataset(spark, path, partition_col="window_id")
