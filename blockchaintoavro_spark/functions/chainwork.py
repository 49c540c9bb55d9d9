"""Chainwork from the compact difficulty encoding — the reference's
``block.getWork()`` math as pure Catalyst expressions.

The reference derives per-block work inside bitcoinj
(``BitcoinBlockHandler.java:96`` calls ``block.getWork()``; bitcoinj's
public implementation is ``2^256 / (target + 1)`` over the BigInteger
target unpacked from the compact 32-bit ``nBits`` field:
``target = mantissa · 2^(8·(size−3))`` with ``size = bits >>> 24`` and
``mantissa = bits & 0x7fffff``; bit 0x800000 is the sign). This module
reimplements that math JVM-side with NO big-integer library:

For the supported encoding range (``size ∈ [20, 32]``, normalized
mantissa ``m ≥ 0x8000`` — which covers every Bitcoin mainnet header ever
mined, whose sizes run ~0x17..0x1d) the divisor is ``t = m·2^e + 1``
with ``e = 8·(size−3) ≥ 136``. Writing ``s = 256 − e ∈ [24, 120]``:

    2^256 / t  =  (2^s / m) · (1 − 1/t)

and the correction term ``(2^s/m)/t < 2^(2·15−…)`` is smaller than
``1/m`` whenever ``2^256 < m·2^(2e)`` (true for ``e ≥ 121``), so the
exact floor collapses to integer math that never exceeds 2^53:

    work = ⌊2^s / m⌋ − (1 if m | 2^s else 0)

``⌊2^s/m⌋`` is evaluated by base-2^30 long division unrolled over the
five digits of ``2^s`` (exactly one digit is nonzero: ``2^(s mod 30)``
at position ``s div 30``). Every intermediate fits double-precision
EXACTLY (dividend ≤ 2^53, quotient digit ≤ 2^38, both integers), so the
whole computation stays inside whole-stage codegen — no UDF, no Python,
no BigDecimal division — and the 38-digit quotient is assembled in
DecimalType(38,0) (work ≤ 2^105 ≈ 4·10^31). Property-tested against
Python's arbitrary-precision ``2**256 // (target+1)`` in
tests/test_operators.py.

Out-of-range encodings surface through the value-or-error twin-column
convention (functions/try_pair.py), mirroring the reference's error
handling around getWork/longValueExact (BitcoinBlockHandler.java:95-101).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MANTISSA_MASK = 0x7FFFFF
_SIGN_BIT = 0x800000
_BASE_BITS = 30
_BASE = 1 << _BASE_BITS
TERAHASH_DIVISOR = 100_000_000_000
_LONG_MAX = (1 << 63) - 1


def with_compact_work(
    df, bits_col: str, work_col: str = "work", error_col: str = "work_error"
):
    """Attach ``work`` (DecimalType(38,0), ``⌊2^256 / (target+1)⌋`` for
    supported encodings — size 20..32, positive, normalized mantissa)
    and the error twin column to ``df``.

    Implemented as a short chain of projections rather than one nested
    expression: each long-division step's remainder feeds the next step
    AND its own quotient digit, so inlining everything would duplicate
    the remainder chain ~2^5 times and blow the generated method past
    janino's limits. Named intermediate columns keep each projection
    small (Catalyst leaves multi-referenced non-trivial aliases alone),
    and the whole chain stays inside one WholeStageCodegen stage
    (plan-asserted in tests/test_plans.py)."""
    bits = F.col(bits_col)
    size = F.shiftrightunsigned(bits, 24)
    m_ = bits.bitwiseAND(F.lit(_MANTISSA_MASK))
    neg = bits.bitwiseAND(F.lit(_SIGN_BIT)) != 0
    s_ = (F.lit(256) - 8 * (size - 3)).cast("int")

    out = df.withColumns({"_cw_s": s_, "_cw_m": m_.cast("long")})
    s, m = F.col("_cw_s"), F.col("_cw_m")
    # base-2^30 long division of 2^s by m, most-significant digit first;
    # 2^s has exactly one nonzero base-2^30 digit: 2^(s mod 30) at s div 30
    rem_prev = F.lit(0).cast("long")
    for i in range(4, -1, -1):
        # 2^(s − 30i) via pow: exponent ≤ 29, so the double is the exact
        # power of two (shiftleft needs a literal shift count)
        d_i = F.when(
            (s >= _BASE_BITS * i) & (s < _BASE_BITS * (i + 1)),
            F.pow(F.lit(2.0), (s - F.lit(_BASE_BITS * i)).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        cur = F.shiftleft(rem_prev, _BASE_BITS) + d_i  # ≤ 2^53: exact
        out = out.withColumn(f"_cw_cur{i}", cur)
        out = out.withColumn(f"_cw_r{i}", F.pmod(F.col(f"_cw_cur{i}"), m))
        out = out.withColumn(
            f"_cw_q{i}",
            ((F.col(f"_cw_cur{i}") - F.col(f"_cw_r{i}")) / m).cast("long"),
        )
        rem_prev = F.col(f"_cw_r{i}")
    q = F.col("_cw_q4").cast("decimal(38,0)")
    for i in range(3, -1, -1):
        q = q * F.lit(_BASE) + F.col(f"_cw_q{i}")
    work = q - F.when(F.col("_cw_r0") == 0, F.lit(1)).otherwise(F.lit(0))

    error = (
        F.when(neg, F.lit("negative difficulty target"))
        .when((size < 20) | (size > 32), F.lit("unsupported difficulty size"))
        .when(m < 0x8000, F.lit("unnormalized mantissa"))
    )
    out = out.withColumn(error_col, error)
    out = out.withColumn(
        work_col,
        F.when(F.col(error_col).isNull(), work).cast("decimal(38,0)"),
    )
    return out.drop(
        "_cw_s", "_cw_m",
        *[f"_cw_{k}{i}" for i in range(5) for k in ("cur", "r", "q")],
    )


def work_terahash_checked(work: Column) -> tuple[Column, Column]:
    """``(work_terahash, error)``: ``⌊work / 1e11⌋`` as long, erroring on
    long-range overflow — the reference's ``divide`` + ``longValueExact``
    pair (BitcoinBlockHandler.java:96-97, divisor :39)."""
    th = F.floor(work / F.lit(TERAHASH_DIVISOR))
    return (
        F.when(work.isNotNull() & (th <= _LONG_MAX), th.cast("long")),
        F.when(work.isNotNull() & (th > _LONG_MAX), F.lit("terahash overflow")),
    )
