"""As-of join (latest right row with right_ts <= left_ts per key).

SURVEY §2.3 Q9 / DQ-14. Spark has no native as-of join; the naive form
(range join + groupBy-max) explodes: every left row matches ~half the right
rows before aggregation. This implementation uses the union-and-scan trick:

    union(left, right) → single shuffle on key → sort by (ts, side) →
    last(right_value, ignorenulls) over rows-unbounded-preceding → keep left

Cost = one Exchange + one sort — identical to a sort-merge join, with NO
row multiplication, so it survives 100 TB (skew on key is handled by AQE
only for joins, so extremely hot keys may warrant pre-salting by time-range;
the window itself is sequential per key by construction).

Tie rule: right rows sort before left rows at equal ts → inclusive (<=)
as-of semantics, matching the correlated ``MAX(ts) WHERE ts <= t`` oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_latest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    out_prefix: str = "asof_",
) -> DataFrame:
    """Attach ``out_prefix + v`` for each right ``value_cols`` entry: the
    value from the latest right row with ``right[right_ts] <= left[left_ts]``
    and matching ``key``; NULL when no such row exists."""
    from pyspark.sql import types as T

    lcols = left.columns
    rval_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    lrow_type = T.StructType(
        [T.StructField(c, left.schema[c].dataType) for c in lcols]
    )
    rval = F.struct(*[F.col(c).alias(c) for c in value_cols])
    # truly-NULL structs (a struct OF nulls would defeat last(ignorenulls))
    null_rval = F.lit(None).cast(rval_type)
    null_lrow = F.lit(None).cast(lrow_type)

    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        null_rval.alias("_rval"),
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        null_lrow.alias("_lrow"),
        rval.alias("_rval"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2).withColumn(
        "_asof", F.last("_rval", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col(f"_asof.{c}").alias(f"{out_prefix}{c}") for c in value_cols],
    )
    return out
