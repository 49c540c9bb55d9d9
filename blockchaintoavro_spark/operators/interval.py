"""Binned range (interval) join — the join shape OSS Spark has no
physical strategy for.

A join whose ONLY predicate is ``start <= point <= end`` has no equi
key, so Catalyst can only plan BroadcastNestedLoopJoin (fine when one
side is tiny, O(n*m) disaster when both sides are large). The classic
fix — what Databricks' range-join optimization and Flink's interval
join do natively — is binning: quantize the range dimension into
fixed-width bins, explode each interval onto every bin it overlaps,
map each point to its single bin, equi-join on the bin id, then
re-check the exact predicate as a post-filter.

Scale: the join becomes a plain hash/sort-merge equi-join on ``_bin``
— shuffle volume = points + intervals×(avg bins per interval), linear
in both inputs. Each point carries exactly one bin, so no dedup pass
is needed. ``bin_width`` trades replication (intervals explode onto
``span/width + 1`` bins) against refine selectivity (a too-wide bin
pairs points with far-away intervals only to filter them); set it near
the median interval span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: Column,
    start_key: Column,
    end_key: Column,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them using bin
    buckets. ``point_key``/``start_key``/``end_key`` must be numeric
    expressions over their respective inputs on a shared scale (for
    dates use ``F.unix_date``, for timestamps ``F.unix_micros``).

    Returns all columns of both inputs for rows satisfying
    ``start_key <= point_key <= end_key``. The bin column is internal.
    Inner joins only (the refine filter would break outer semantics).
    """
    if how != "inner":
        raise ValueError("bin_range_join supports inner joins only")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    p = points.withColumn("_bin", F.floor(point_key / bin_width))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.floor(start_key / bin_width), F.floor(end_key / bin_width))
        ),
    )
    joined = p.join(i, "_bin").filter(
        (point_key >= start_key) & (point_key <= end_key)
    )
    return joined.drop("_bin")
