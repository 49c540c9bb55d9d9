"""Vector math over ``array<float|double>`` columns — pure higher-order
functions (JVM-side, codegen'd); no UDFs.

Scale note (100 TB): these are narrow per-row expressions — no shuffle, no
Python. Cast to double FIRST so both engines (and any oracle) do identical
IEEE-double arithmetic with identical left-to-right summation order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential fold — deterministic
    summation order, matches a scalar loop)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
