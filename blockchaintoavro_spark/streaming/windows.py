"""Streaming window aggregations (SURVEY ST2-ST5, DQ-29/30 streaming twins).

Each has a batch-equivalent declared query (plans/relational.py dq29/dq30);
tests replay the events table through a stream and assert equality with the
batch result — the contract that makes the streaming path trustworthy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    cast is a wall-clock identity."""
    return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def streaming_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    width: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling counts/sums per event_type (ST2 + ST5 watermark)."""
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("win.start").alias("w"), "event_type", "n", "total")
    )


def streaming_sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    width: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding-window counts (ST3)."""
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("w_start"), "n")
    )


def streaming_session_agg(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based session windows (ST4) — built-in session_window; the batch
    twin is operators/sessionize.py (gaps-and-islands)."""
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
