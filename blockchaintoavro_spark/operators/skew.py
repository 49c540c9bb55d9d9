"""Skew mitigation for aggregations (SCALE.md global posture).

AQE's skew handling splits oversized *join* partitions; a hot grouping
key in a groupBy still lands every row on one reducer. For algebraic
aggregates (sum/count/min/max — anything with a merge function) the fix
is salting: aggregate on (key, salt) first, then merge the partials per
key. Shuffle 1 spreads each hot key over ``n_salts`` reducers; shuffle 2
carries only ``n_salts`` rows per key.

This generalizes the reference's implicit assumption that one worker can
absorb any block (``BitcoinBlockHandler.java:61-76``) — true for 1 MB
blocks, false for hot keys at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_fn) per supported algebraic aggregate
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs``: output_name -> (agg_fn_name, input_column); fn one of
    sum/count/min/max. ``avg`` callers decompose to sum+count and divide.

    The salt is ``pmod(hash(all input columns...), n_salts)`` — cheap,
    deterministic per row, and uniform; ``spark_partition_id`` would also
    work but ties the result layout to input partitioning.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_ALGEBRAIC)
    if unknown:
        raise ValueError(f"non-algebraic aggregates not saltable: {unknown}")

    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partials = [
        _ALGEBRAIC[fn][0](col).alias(f"__p_{name}")
        for name, (fn, col) in aggs.items()
    ]
    finals = [
        _ALGEBRAIC[fn][1](f"__p_{name}").alias(name)
        for name, (fn, _) in aggs.items()
    ]
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )


def salted_count_distinct(
    df: DataFrame, keys: list[str], distinct_col: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT x) per key without funneling a hot key through one
    reducer: salt by the *distinct value* (so duplicates of the same value
    land on the same salt and dedup locally), count distinct per
    (key, salt), sum the disjoint partial counts."""
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salts))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(distinct_col).alias("__n"))
        .groupBy(*keys)
        .agg(F.sum("__n").cast("long").alias(f"n_distinct_{distinct_col}"))
    )
