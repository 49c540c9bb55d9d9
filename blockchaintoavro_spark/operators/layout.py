"""Multi-dimensional data layout (Z-order clustering) for parquet at
100 TB.

A single-column sort gives min/max (file/row-group) pruning on ONE
column; queries filtering the second dimension scan everything. Z-order
interleaves the bits of each row's per-column buckets into one Morton
key and range-partitions + sorts on it, so every output file covers a
small hyper-rectangle of the value space — point/range predicates on
ANY of the clustered columns prune most files via ordinary parquet
min/max statistics. This is the layout maintenance step of the public
lakehouse engines (Delta OPTIMIZE ZORDER BY, Iceberg rewrite with
z-ordering), re-expressed as plain DataFrame ops:

- per-column equi-width bucketing to ``bits``-bit codes from a ONE-PASS
  global min/max aggregate (driver-side model parameters — the same
  bounded-collect pattern as IVF centroids, never data);
- Morton interleave as a pure Catalyst bit expression (codegen-friendly
  shifts/masks, no UDF);
- ``repartitionByRange`` on the key (contiguous Z-ranges per file) +
  ``sortWithinPartitions`` so row groups inside each file are tight
  too.

Equi-width buckets keep the key computable without a quantile pass;
heavily skewed columns still prune correctly (min/max stats are exact)
but balance less evenly — pass more ``bits`` or pre-transform (log) a
skewed column if file sizes matter more than simplicity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equiwidth_bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Value → integer bucket in ``[0, 2**bits)`` by linear scaling of
    the ``[lo, hi]`` domain (clamped; a degenerate domain maps to 0)."""
    n = 1 << bits
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo)))
              / F.lit(float(hi - lo)) * F.lit(n))
    return F.least(
        F.greatest(F.floor(scaled), F.lit(0)), F.lit(n - 1)
    ).cast("long")


def morton_interleave(buckets: list[Column], bits: int) -> Column:
    """Bit-interleave ``d`` bucket codes (each < 2**bits) into one
    Morton key: bit ``i`` of bucket ``j`` lands at position ``i*d + j``.
    Pure shifts/masks — stays inside whole-stage codegen."""
    d = len(buckets)
    if d * bits > 63:
        raise ValueError(
            f"morton key needs {d * bits} bits but a Spark long holds 63 "
            f"(signed): lower bits to <= {63 // d} for {d} columns"
        )
    terms = []
    for j, b in enumerate(buckets):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[Column, dict]:
    """The Morton key expression for ``cols`` plus the per-column
    ``(min, max)`` domains it was built from (one aggregate pass,
    driver-side scalars)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    domains = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
    for c, (lo, hi) in domains.items():
        if lo is None or hi is None:
            raise ValueError(
                f"cannot z-order on column {c!r}: no non-NULL values"
            )
    # NULL values bucket to 0 (the greatest(NULL, 0) clamp), i.e. they
    # co-cluster with the column's minimum — documented behavior; filter
    # or impute first if NULLs should live elsewhere
    buckets = [
        equiwidth_bucket(F.col(c), float(lo), float(hi), bits)
        for c, (lo, hi) in domains.items()
    ]
    return morton_interleave(buckets, bits), domains


def zorder_by(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Rows re-clustered on the Z-curve over ``cols`` into ``n_files``
    contiguous key ranges (write the result with a plain
    ``.write.parquet`` — one file per partition, each covering a small
    hyper-rectangle in every clustered column).

    Cost note: ``repartitionByRange`` samples the child once for its
    range boundaries and once for the exchange (standard Spark range
    partitioning), on top of the min/max pass — i.e. layout maintenance
    reads the input ~3×, which is the same order as the lakehouse
    OPTIMIZE jobs this mirrors; run it on compacted batches, not per
    micro-batch."""
    key, _ = zorder_key(df, cols, bits)
    tagged = df.withColumn("_zkey", key)
    return (
        tagged.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
