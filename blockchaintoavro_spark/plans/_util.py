"""Shared helpers for declared-query builders (canonicalization contract,
FIXTURES.md §4): decimal-exact money math, table loading.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_events, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table; events gets its ns-timestamp normalization."""
    if name == "events":
        return load_events(spark, sf_dir)
    return load_table(spark, sf_dir, name)


def dec2(c: Column | str) -> Column:
    """Cast an input to DECIMAL(18,2) *before* aggregation so both engines
    do exact decimal arithmetic (no IEEE summation-order drift)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def money(c: Column) -> Column:
    """Canonical money output: ROUND(x, 2) in decimal, rendered as DOUBLE.

    Decimal math stays internal (exact, order-insensitive sums); the final
    DOUBLE cast makes the value render identically in every engine and
    driver: a 2-dp decimal whose unscaled value fits in 2^53 converts to
    the *same* nearest double in Spark and DuckDB, while DECIMAL-typed
    outputs render scale-sensitively ('138014.00' vs '138014.0') and
    hash-diverge (round-1 driver finding).
    """
    return F.round(c, 2).cast("decimal(38,2)").cast("double")


def dbl(c: Column, n: int = 4) -> Column:
    """Canonical ratio/similarity output: ROUND(x, n) decimal → DOUBLE.

    Same output-boundary contract as :func:`money` at ``n`` decimal places.
    """
    return F.round(c, n).cast(f"decimal(38,{n})").cast("double")
