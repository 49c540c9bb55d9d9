"""Fixed schemas (SURVEY §1.4: the reference is compile-time-schema only).

``BLOCKS_SCHEMA`` mirrors the reference Avro schema
``bitcoin_blocks/src/main/avro/com/google/BlockToBq/BQRow.avsc:1-51``
(four record types: input :1-13, output :14-25, transaction :26-34,
block :35-51) plus the two harness columns from FIXTURES.md §1
(``ingest_id`` dedup tiebreak, ``work`` raw derivation input).

``PRICES_SCHEMA`` mirrors ``bitcoin_pricing/ingest_prices.sh:10``
(``timestamp:timestamp,priceUSD:float,volumeBTC:float``; BigQuery FLOAT is
8-byte, so DoubleType).

Notes kept for parity:
- ``timestamp`` is epoch **milliseconds** as a plain long
  (``BitcoinBlockHandler.java:90``), no logical type.
- nullable Avro unions (incl. the reversed ``["long","null"]`` at
  ``BQRow.avsc:19``) → ``nullable=True``.
- script bytes are raw binary (``BQRow.avsc:6,20``).
"""

from __future__ import annotations

from pyspark.sql import types as T

INPUT_STRUCT = T.StructType(
    [
        T.StructField("input_script_bytes", T.BinaryType(), True),
        T.StructField("input_script_string", T.StringType(), True),
        T.StructField("input_script_string_error", T.StringType(), True),
        T.StructField("input_sequence_number", T.LongType(), True),
        T.StructField("input_pubkey_base58", T.StringType(), True),
        T.StructField("input_pubkey_base58_error", T.StringType(), True),
    ]
)

OUTPUT_STRUCT = T.StructType(
    [
        T.StructField("output_satoshis", T.LongType(), True),
        T.StructField("output_script_bytes", T.BinaryType(), True),
        T.StructField("output_script_string", T.StringType(), True),
        T.StructField("output_script_string_error", T.StringType(), True),
        T.StructField("output_pubkey_base58", T.StringType(), True),
        T.StructField("output_pubkey_base58_error", T.StringType(), True),
    ]
)

TRANSACTION_STRUCT = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), True),
        T.StructField("inputs", T.ArrayType(INPUT_STRUCT), True),
        T.StructField("outputs", T.ArrayType(OUTPUT_STRUCT), True),
    ]
)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("ingest_id", T.LongType(), False),
        T.StructField("block_id", T.StringType(), True),
        T.StructField("previous_block", T.StringType(), True),
        T.StructField("merkle_root", T.StringType(), True),
        T.StructField("timestamp", T.LongType(), True),  # epoch millis
        T.StructField("difficultyTarget", T.LongType(), True),
        T.StructField("nonce", T.LongType(), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("work", T.LongType(), True),
        T.StructField("work_terahash", T.LongType(), True),
        T.StructField("work_error", T.StringType(), True),
        T.StructField("transactions", T.ArrayType(TRANSACTION_STRUCT), True),
    ]
)

def pruned_blocks(
    block_fields: list[str],
    tx_fields: list[str] | None = None,
    input_fields: list[str] | None = None,
    output_fields: list[str] | None = None,
) -> T.StructType:
    """Subset read schema for the blocks table (leaf-level pruning).

    Catalyst prunes nested columns through one ``explode`` but not through
    the doubly-nested ``transactions[].inputs[]/outputs[]`` chain; passing
    the subset schema to ``spark.read.schema`` pushes the pruning into the
    parquet scan itself (ReadSchema shrinks — asserted in test_plans.py).

    Field order must follow the full schema (parquet maps by name, but a
    consistent order keeps plan diffs readable).
    """

    def _sub(struct: T.StructType, names: list[str]) -> T.StructType:
        keep = set(names)
        return T.StructType([f for f in struct.fields if f.name in keep])

    tx_struct = []
    for f in TRANSACTION_STRUCT.fields:
        if f.name == "inputs":
            if input_fields is not None:
                tx_struct.append(
                    T.StructField(
                        "inputs",
                        T.ArrayType(_sub(INPUT_STRUCT, input_fields)),
                        True,
                    )
                )
        elif f.name == "outputs":
            if output_fields is not None:
                tx_struct.append(
                    T.StructField(
                        "outputs",
                        T.ArrayType(_sub(OUTPUT_STRUCT, output_fields)),
                        True,
                    )
                )
        elif tx_fields is not None and f.name in set(tx_fields):
            tx_struct.append(f)

    out = []
    keep = set(block_fields)
    for f in BLOCKS_SCHEMA.fields:
        if f.name == "transactions":
            if tx_struct:
                out.append(
                    T.StructField(
                        "transactions", T.ArrayType(T.StructType(tx_struct)), True
                    )
                )
        elif f.name in keep:
            out.append(f)
    return T.StructType(out)


PRICES_SCHEMA = T.StructType(
    [
        # NTZ: the reference CSVs carry naive wall-clock timestamps
        # (ingest_prices.sh:10); NTZ also matches the DuckDB oracle exactly.
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("priceUSD", T.DoubleType(), True),
        T.StructField("volumeBTC", T.DoubleType(), True),
    ]
)

# Driver-generated testdata tables (FIXTURES.md §3) — read with schema
# inference off the parquet footer; names listed for view registration.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
