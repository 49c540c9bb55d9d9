#!/usr/bin/env python3
"""Generate the deterministic blocks + prices fixtures (FIXTURES.md §1-2).

Seed=42, pure python + pyarrow — no Spark needed. Output:
- fixtures/blocks.parquet   nested block→transactions[]→inputs[]/outputs[]
  mirroring the reference Avro schema (BQRow.avsc:1-51) plus harness columns
  (ingest_id tiebreak, raw work input).
- fixtures/prices/{coinbaseUSD,krakenUSD}.csv.gz   headerless gzipped CSVs
  mirroring ingest_prices.sh:10 (timestamp,priceUSD,volumeBTC).

Both committed to the repo; re-running reproduces byte-identical logical
content (parquet metadata may differ — consumers compare values, not bytes).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 42
N_DISTINCT = 1800
N_PHYSICAL = 2000
GENESIS = "0" * 64
TERAHASH_DIV = 100_000_000_000  # 1e11 per BitcoinBlockHandler.java:39
COINBASE_SEQ = 4294967295

BASE58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _hex(tag: str) -> str:
    return hashlib.sha256(tag.encode()).hexdigest()


def _base58(rng: random.Random) -> str:
    return "1" + "".join(rng.choice(BASE58_ALPHABET) for _ in range(33))


def _make_input(rng: random.Random, coinbase: bool) -> dict:
    script = bytes(rng.getrandbits(8) for _ in range(rng.randint(8, 32)))
    row: dict = {
        "input_script_bytes": script,
        "input_sequence_number": COINBASE_SEQ if coinbase or rng.random() < 0.9 else rng.getrandbits(31),
    }
    if rng.random() < 0.03:
        row["input_script_string"] = None
        row["input_script_string_error"] = f"script parse error at byte {rng.randint(0, 31)}"
    else:
        row["input_script_string"] = f"PUSHDATA({script[:4].hex()})"
        row["input_script_string_error"] = None
    if coinbase:
        # coinbase rule: empty string, NOT null, no error
        # (BitcoinBlockHandler.java:144-145)
        row["input_pubkey_base58"] = ""
        row["input_pubkey_base58_error"] = None
    elif rng.random() < 0.03:
        row["input_pubkey_base58"] = None
        row["input_pubkey_base58_error"] = "could not decode address"
    else:
        row["input_pubkey_base58"] = _base58(rng)
        row["input_pubkey_base58_error"] = None
    return row


def _make_output(rng: random.Random) -> dict:
    script = bytes(rng.getrandbits(8) for _ in range(rng.randint(8, 32)))
    row: dict = {
        "output_satoshis": None if rng.random() < 0.02 else rng.randint(1, 50_0000_0000),
        "output_script_bytes": script,
    }
    if rng.random() < 0.03:
        row["output_script_string"] = None
        row["output_script_string_error"] = f"script parse error at byte {rng.randint(0, 31)}"
    else:
        row["output_script_string"] = f"PUSHDATA({script[:4].hex()})"
        row["output_script_string_error"] = None
    if rng.random() < 0.03:
        row["output_pubkey_base58"] = None
        row["output_pubkey_base58_error"] = "could not decode address"
    else:
        row["output_pubkey_base58"] = _base58(rng)
        row["output_pubkey_base58_error"] = None
    return row


def gen_blocks() -> list[dict]:
    rng = random.Random(SEED)
    blocks: list[dict] = []
    t0 = 1_577_836_800_000  # 2020-01-01T00:00:00Z in epoch millis
    tx_counter = 0
    for i in range(N_DISTINCT):
        block_id = _hex(f"block-{i}")
        prev = GENESIS if i == 0 else _hex(f"block-{i - 1}")
        work = -rng.randint(1, 10**9) if rng.random() < 0.02 else rng.randint(TERAHASH_DIV, 9 * 10**15)
        n_tx = 0 if rng.random() < 0.05 else rng.randint(1, 20)
        txs = []
        for j in range(n_tx):
            tx_counter += 1
            txs.append(
                {
                    "transaction_id": _hex(f"tx-{tx_counter}"),
                    "inputs": [
                        _make_input(rng, coinbase=(j == 0 and k == 0))
                        for k in range(rng.randint(1, 4))
                    ],
                    "outputs": [_make_output(rng) for _ in range(rng.randint(1, 4))],
                }
            )
        blocks.append(
            {
                "block_id": block_id,
                "previous_block": prev,
                "merkle_root": _hex(f"merkle-{i}"),
                "timestamp": t0 + i * 600_000 + rng.randint(0, 59_999),
                "difficultyTarget": rng.getrandbits(34),
                "nonce": rng.getrandbits(32),
                "version": rng.choice([1, 2, 4]),
                "work": work,
                "work_terahash": (work // TERAHASH_DIV) if work > 0 else None,
                "work_error": None if work > 0 else "negative work",
                "transactions": txs,
            }
        )
    # duplicates with identical payload (at-least-once ingest, etl.sh:6-17)
    dup_rng = random.Random(SEED + 1)
    dup_ids = dup_rng.sample(range(N_DISTINCT), 185)
    rows = list(blocks)
    for n, bi in enumerate(dup_ids):
        rows.append(blocks[bi])
        if n < N_PHYSICAL - N_DISTINCT - len(dup_ids):  # 15 blocks appear 3×
            rows.append(blocks[bi])
    assert len(rows) == N_PHYSICAL, len(rows)
    dup_rng.shuffle(rows)
    return [{"ingest_id": i, **r} for i, r in enumerate(rows)]


INPUT_T = pa.struct(
    [
        ("input_script_bytes", pa.binary()),
        ("input_script_string", pa.string()),
        ("input_script_string_error", pa.string()),
        ("input_sequence_number", pa.int64()),
        ("input_pubkey_base58", pa.string()),
        ("input_pubkey_base58_error", pa.string()),
    ]
)
OUTPUT_T = pa.struct(
    [
        ("output_satoshis", pa.int64()),
        ("output_script_bytes", pa.binary()),
        ("output_script_string", pa.string()),
        ("output_script_string_error", pa.string()),
        ("output_pubkey_base58", pa.string()),
        ("output_pubkey_base58_error", pa.string()),
    ]
)
TX_T = pa.struct(
    [
        ("transaction_id", pa.string()),
        ("inputs", pa.list_(INPUT_T)),
        ("outputs", pa.list_(OUTPUT_T)),
    ]
)
BLOCKS_T = pa.schema(
    [
        ("ingest_id", pa.int64()),
        ("block_id", pa.string()),
        ("previous_block", pa.string()),
        ("merkle_root", pa.string()),
        ("timestamp", pa.int64()),
        ("difficultyTarget", pa.int64()),
        ("nonce", pa.int64()),
        ("version", pa.int64()),
        ("work", pa.int64()),
        ("work_terahash", pa.int64()),
        ("work_error", pa.string()),
        ("transactions", pa.list_(TX_T)),
    ]
)


def gen_prices() -> None:
    out_dir = os.path.join(HERE, "prices")
    os.makedirs(out_dir, exist_ok=True)
    for ex_i, exchange in enumerate(["coinbaseUSD", "krakenUSD"]):
        rng = random.Random(SEED + 100 + ex_i)
        t = 1_704_067_200  # 2024-01-01T00:00:00Z epoch seconds
        lines = []
        price = 42_000.0
        for _ in range(5000):
            t += rng.randint(1, 120)
            price = round(max(1000.0, price + rng.uniform(-50, 50)), 2)
            vol = round(rng.uniform(0.0001, 25.0), 4)
            from datetime import datetime, timezone

            ts = datetime.fromtimestamp(t, tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
            lines.append(f"{ts},{price:.2f},{vol:.4f}")
        with gzip.open(os.path.join(out_dir, f"{exchange}.csv.gz"), "wt", newline="") as f:
            f.write("\n".join(lines) + "\n")


def main() -> None:
    rows = gen_blocks()
    table = pa.Table.from_pylist(rows, schema=BLOCKS_T)
    pq.write_table(table, os.path.join(HERE, "blocks.parquet"), compression="snappy")
    gen_prices()
    print(f"wrote {len(rows)} block rows; prices CSVs done")


if __name__ == "__main__":
    main()
