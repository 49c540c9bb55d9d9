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


def psort(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Presentation sort for results computed by a Python stage: identical
    rows and order to ``df.orderBy(*cols)``, but the Arrow/pandas stage
    executes ONCE instead of twice.

    A bare ``orderBy`` plans ``Exchange rangepartitioning`` directly over
    the Python node, and the range partitioner's sampling pass re-executes
    the whole child lineage — every mapInPandas batch runs twice (measured:
    x_jpeg_decode 10.1 → 4.7 CPU-s, python rows processed 10000 → 5000 for
    a 5000-doc input). The AQE ``REBALANCE`` barrier materializes the
    Python stage's small feature rows as shuffle output first, so the sort
    samples shuffle files instead of re-running Python — guide §8's rule
    (sort/decide on the materialized small rows, never by re-running the
    expensive operator) applied to presentation sorts. REBALANCE (not
    ``repartition(n)``) keeps the barrier scale-adaptive: AQE coalesces or
    splits it from data size, nothing is tuned to the local core count.
    Only worth it over a Python stage — a JVM subtree re-executes cheaply,
    so plain ``orderBy`` keeps the simpler single-exchange plan there.
    """
    return df.hint("rebalance").orderBy(*cols)


def dbl(c: Column, n: int = 4) -> Column:
    """Canonical ratio/similarity output: ROUND(x, n) decimal → DOUBLE.

    Same output-boundary contract as :func:`money` at ``n`` decimal places.
    """
    return F.round(c, n).cast(f"decimal(38,{n})").cast("double")


# --- integer fixed-point money aggregation (hot-path twin of dec2/money) ---
#
# Decimal SUMs are exact but slow: every row pays a 128-bit decimal add in
# the hash aggregate (profiled 2x the whole-query cost of long sums on the
# star join). The fixture's money columns are 2-dp by construction (TPC-H
# convention), so ROUND(x*100)::BIGINT is a lossless fixed-point view and
# integer products/sums reproduce the oracle's decimal arithmetic exactly.
#
# A single BIGINT accumulator would overflow: at TPC-H SF~100k (the 100 TB
# target) a per-group revenue sum reaches ~2e20 in 1e-4-dollar units > 2^63.
# So the sum is split into two 64-bit accumulators — SUM(x >> 23) and
# SUM(x & (2^23-1)) — and recombined into one DECIMAL(38,0) per *group*
# after aggregation. The two's-complement identity
# x == (x >> 23)*2^23 + (x & (2^23-1)) holds for every long, so the split
# is exact for any sign; it is overflow-safe while
# rows_per_group * max(|x|) / 2^23 < 2^63, i.e. ~1e12 rows/group at
# charge-sized products (~4e11) — an order of magnitude past SF100k.

_SPLIT_BITS = 23
_SPLIT_MASK = (1 << _SPLIT_BITS) - 1


def cents(c: Column | str, scale: int = 2) -> Column:
    """Lossless BIGINT fixed-point view of a money column at ``scale`` dp.

    Matches ``CAST(x AS DECIMAL(_, scale))`` (dec2) on the fixture's money
    domain: nonnegative values carrying at most ``scale`` decimal digits.
    (At an exact .5 tie Spark rounds half-up and DuckDB half-away-from-zero
    — identical for nonnegative inputs.)
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * (10 ** scale)).cast("long")


def exact_sum_fixed(prod: Column, frac_digits: int) -> Column:
    """Overflow-safe exact SUM of a BIGINT fixed-point expression, returned
    as the decimal value scaled down by ``10^frac_digits``.

    Aggregate-side cost is two plain BIGINT sums (whole-stage-codegen long
    adds, no 128-bit decimal in the per-row loop); the decimal recombine
    runs once per group. Use with :func:`money`/``cast`` at the output
    boundary exactly like a decimal SUM.
    """
    lo = F.sum(prod.bitwiseAND(F.lit(_SPLIT_MASK)))
    hi = F.sum(F.shiftright(prod, _SPLIT_BITS))
    total = hi.cast("decimal(38,0)") * F.lit(1 << _SPLIT_BITS) + lo
    return total / F.lit(10 ** frac_digits)
