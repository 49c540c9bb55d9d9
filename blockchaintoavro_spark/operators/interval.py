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

Scale: the join becomes a plain hash/sort-merge equi-join on the bin
id — shuffle volume = points + intervals×(avg bins per interval),
linear in both inputs. Each point carries exactly one bin, so no dedup
pass is needed. ``bin_width`` trades replication (intervals explode
onto ``span/width + 1`` bins) against refine selectivity (a too-wide
bin pairs points with far-away intervals only to filter them); set it
near the median interval span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Internal equi-join column; unlikely to collide with user columns.
_BIN = "_brj_bin"


def _floor_div(key: Column, width: int) -> Column:
    """Exact floor(key / width) for 64-bit keys.

    ``F.floor(col / lit)`` promotes to DOUBLE, whose 53-bit mantissa
    mis-bins keys past 2^53 — e.g. ``unix_micros`` epochs (~1.7e18)
    would silently land points one bin away from their interval and
    drop matches. pmod isolates the remainder exactly in long math;
    the division of the exact multiple runs in DECIMAL(38,0), exact at
    any long magnitude.
    """
    k = key.cast("long")
    rem = F.pmod(k, F.lit(width))  # in [0, width) for positive width
    return ((k.cast("decimal(38,0)") - rem) / F.lit(width)).cast("long")


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
    ``start_key <= point_key <= end_key``. The two inputs must have
    disjoint column names (alias/rename before calling, exactly as for
    a Spark expression join — the refine predicate resolves the key
    expressions against the joined frame by name). Inverted intervals
    (``end < start``) yield no rows — and, importantly, no bin
    explosion: without the guard Spark's ``sequence`` would step
    DOWNWARD through the reversed span and a single corrupt row could
    generate millions of bin copies. Inner joins only (the refine
    filter would break outer semantics).
    """
    if how != "inner":
        raise ValueError("bin_range_join supports inner joins only")
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    for side, frame in (("points", points), ("intervals", intervals)):
        if _BIN in frame.columns:
            raise ValueError(
                f"{side} input already has a column named {_BIN!r} "
                "(internal bin key) — rename it before joining"
            )
    start_bin = _floor_div(start_key, bin_width)
    end_bin = _floor_div(end_key, bin_width)
    p = points.withColumn(_BIN, _floor_div(point_key, bin_width))
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.when(start_bin <= end_bin, F.sequence(start_bin, end_bin)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    joined = p.join(i, _BIN).filter(
        (point_key >= start_key) & (point_key <= end_key)
    )
    return joined.drop(_BIN)
