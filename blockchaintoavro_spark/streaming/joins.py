"""Streaming interval join (Flink-parity stream-stream join with
event-time bounds) — the streaming twin of operators/interval.py.

Spark executes a stream-stream inner join by buffering both sides in
state; an unconstrained join buffers forever. The watermark + time-range
condition is what makes it bounded: rows older than
``watermark + lookback`` are evicted from state, so state size is
O(rate × (watermark + lookback)) regardless of how long the query runs
— the same windowed-state posture as the tumbling/session aggs
(windows.py). The equi key keeps the shuffle hash-partitioned; both
streams co-partition on it, exactly like the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Join each point event to every interval-anchor event of the same
    ``key`` whose timestamp falls within ``lookback`` BEFORE the point
    (``anchor_ts <= point_ts <= anchor_ts + lookback``). Output columns:
    key, ``p_id``/``p_ts`` from points, ``i_id``/``i_ts`` from intervals.

    Both inputs must carry ``event_id`` and ``ts_col``; they may be
    streaming or batch DataFrames — the same plan is the batch oracle
    (tests assert stream == batch over a replayed file source).
    """
    p = (
        points.withColumn("_pts", F.col(ts_col).cast("timestamp"))
        .withWatermark("_pts", watermark)
        .select(
            F.col(key).alias("_pk"),
            F.col("event_id").alias("p_id"),
            F.col("_pts"),
        )
    )
    i = (
        intervals.withColumn("_its", F.col(ts_col).cast("timestamp"))
        .withWatermark("_its", watermark)
        .select(
            F.col(key).alias("_ik"),
            F.col("event_id").alias("i_id"),
            F.col("_its"),
        )
    )
    cond = (
        (F.col("_pk") == F.col("_ik"))
        & (F.col("_pts") >= F.col("_its"))
        & (F.col("_pts") <= F.col("_its") + F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(i, cond, "inner").select(
        F.col("_pk").alias(key),
        "p_id",
        F.col("_pts").alias("p_ts"),
        "i_id",
        F.col("_its").alias("i_ts"),
    )
