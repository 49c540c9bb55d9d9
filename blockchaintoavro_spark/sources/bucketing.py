"""Bucketed (co-located) tables — the shuffle-elimination path for
repeated large-×-large joins (SCALE.md 'Joins').

The reference's BigQuery tables have no user-visible physical layout; at
100 TB on Spark, the fact-to-fact join (e.g. lineitem⋈orders on orderkey,
repeated by every downstream query) should not re-shuffle both sides every
run. Writing both tables bucketed (and sorted) by the join key lets the
planner read matching buckets side-by-side: SortMergeJoin with ZERO
Exchange (plan-asserted in tests/test_plans.py).

Bucket-count guidance: pick so each bucket ≈ 100-200 MB at target scale;
both tables must use the same count (or a multiple, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed table.

    Sorting within buckets makes the downstream SortMergeJoin skip its
    sort too — the join becomes a pure streaming merge of co-located,
    pre-sorted buckets.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With matching
    bucket specs the physical plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
