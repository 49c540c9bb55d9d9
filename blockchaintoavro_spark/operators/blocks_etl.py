"""The reference's own ETL pipeline, Spark-first (SURVEY §2.2/§2.3-A).

Reference: ``bitcoin_bigquery_etl/etl.sh:5-33`` — the only SQL the repo
ships. Shape: dedup blocks by ``ROW_NUMBER() OVER (PARTITION BY block_id)``
(etl.sh:12, no ORDER BY — we add the deterministic ``ingest_id`` tiebreak),
keep rn=1 (etl.sh:16-17), inner-unnest ``transactions`` (etl.sh:30-33), and
project ``transactions.*`` + block header columns (etl.sh:20-29).

Scale notes:
- dedup = one Exchange on block_id; AQE skew-join/partition handling applies.
  ``dropDuplicates`` would be cheaper (partial-agg before shuffle) but the
  declared form preserves the reference's window semantics with tiebreak.
- explode is a narrow Generate node — no shuffle; nested-schema pruning keeps
  the scan from reading inputs[]/outputs[] when only tx ids are projected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.try_pair import work_terahash


def dedup_blocks(blocks: DataFrame, tiebreak: str = "ingest_id") -> DataFrame:
    """Keep one row per block_id — etl.sh:6-17 with deterministic tiebreak."""
    w = Window.partitionBy("block_id").orderBy(tiebreak)
    return (
        blocks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def flatten_transactions(blocks: DataFrame) -> DataFrame:
    """One row per transaction — etl.sh:20-33 (inner unnest drops blocks
    with empty transaction arrays, matching BigQuery's JOIN UNNEST)."""
    tera, terr = work_terahash(F.col("work"))
    return (
        blocks.withColumn(
            "transactions", F.coalesce("transactions", F.array())
        )  # null→[] default, BitcoinBlockHandler.java:103-104
        .select(
            "block_id",
            "previous_block",
            "merkle_root",
            F.col("timestamp").alias("timestamp"),
            "nonce",
            "version",
            tera.alias("work_terahash"),
            terr.alias("work_error"),
            F.explode("transactions").alias("t"),
        )
        .select(
            "block_id",
            "previous_block",
            "merkle_root",
            "timestamp",
            "nonce",
            "version",
            "work_terahash",
            "work_error",
            F.col("t.transaction_id").alias("transaction_id"),
        )
    )


def publish_transactions(blocks: DataFrame) -> DataFrame:
    """Full flagship ETL: dedup → flatten (etl.sh end-to-end)."""
    return flatten_transactions(dedup_blocks(blocks))
