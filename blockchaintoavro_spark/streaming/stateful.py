"""Custom stateful streaming operators (SURVEY §2.3-E ST5/ST6).

The reference daemon keeps implicit state (the open rotated file, the
at-least-once retry counters — ``AvroWriter.java:38-49``,
``BitcoinBlockHandler.java:35``); its duplicate tolerance is resolved
downstream in SQL (``etl.sh:6-17``). The engine's streaming twins:

- ``streaming_dedup``: watermark-bounded exactly-once-per-key emission
  (``withWatermark + dropDuplicates`` — bounded state; the batch twin is
  dq06's window dedup).
- ``running_user_totals``: arbitrary per-key state via
  ``applyInPandasWithState`` (Arrow-batched; one state row per key) — the
  engine's custom-stateful-operator surface. Batch twin: plain
  ``groupBy().agg()`` over the same data (test-asserted).

Scale note (100 TB): state is partitioned by the grouping key across the
cluster and checkpointed incrementally (RocksDB state store in prod
configs); the watermark bounds state size for dedup. Neither operator ever
collects to the driver.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen-wins streaming dedup with watermark-bounded state (ST5).

    Emits each key once; keys older than the watermark are dropped from
    state, so memory is bounded by (keys per watermark window).
    """
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(key_cols)
    )


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-key (count, sum) maintained as explicit group state.

    Every micro-batch emits the updated running totals for keys seen in
    that batch (output mode ``update``). The final emission per key equals
    the batch ``groupBy(key).agg(count, sum)`` over the same data.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitter_candidates(
    stream: DataFrame,
    col: str,
    k: int = 100,
    shards: int = 32,
) -> DataFrame:
    """Streaming frequent-items candidates with BOUNDED state — the
    streaming twin of ``operators/heavyhitters.py``'s per-partition
    Misra-Gries pass (same ``mg_add`` arithmetic, same guarantee).

    Items are routed to ``shards`` parallel summaries by
    ``xxhash64(item) % shards``; each shard keeps a k-counter MG state
    row and re-emits its candidate set whenever a batch touches it
    (output mode ``update``). Because every occurrence of an item lands
    in ONE shard, any item whose total stream count exceeds
    ``n/(k+1)`` necessarily exceeds its own shard's ``n_s/(k+1)``
    (``n_s ≤ n``), so the union of shard candidates is a SUPERSET of
    every true heavy hitter — a strictly stronger argument than the
    batch plan's pigeonhole over arbitrary row partitions. ``mg_lower``
    never exceeds the item's true count (MG lower bound). Each
    emission also carries ``shard_rows`` — the exact count of non-NULL
    items the shard has absorbed so far — so the heavy-hitter
    threshold denominator (total stream size = sum of final
    ``shard_rows``) rides the same bounded state. An exact recount
    (``operators.heavyhitters.recount_candidates`` — broadcast
    semi-join over the stored corpus; declared hash-checked as
    x_streaming_hh_exact) turns candidates into exact answers with no
    extra counting scan.

    Scale: state is ``shards × k`` counters cluster-wide, partitioned
    by shard and checkpointed incrementally; the per-batch work is one
    Exchange on the shard id + an Arrow-batched value_counts fold.
    ``col`` must be a string column (state schema is array<string>).

    COMPATIBILITY: r14 widened the state schema (``shard_rows bigint``
    joined ``items``/``counts``) — a checkpoint written by the r13
    2-field schema cannot be resumed by this version (Spark's
    state-store schema check fails the restart). Restart such a query
    on a FRESH checkpoint and replay the source; the exactly-once
    store fences make the replay idempotent downstream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.heavyhitters import mg_add

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        items, counts, seen = state.get if state.exists else ([], [], 0)
        counters = dict(zip(items, counts))
        for pdf in pdfs:
            vc = pdf[col].dropna().value_counts()
            for item, w in vc.items():
                mg_add(counters, item, int(w), k)
                seen += int(w)
        state.update(
            (list(counters), [int(v) for v in counters.values()], int(seen))
        )
        # a shard whose counters all decremented away this batch still
        # emits one NULL-item marker row (the batch _mg_fold contract):
        # otherwise a last-emission consumer would keep the PREVIOUS
        # batch's stale candidates AND a stale shard_rows, undercounting
        # the exact-recount denominator
        items = list(counters)
        lowers = [int(v) for v in counters.values()]
        if not items:
            items, lowers = [None], [0]
        yield pd.DataFrame(
            {
                "shard": key[0],
                "item": items,
                "mg_lower": lowers,
                "shard_rows": int(seen),
            }
        )

    shard = F.pmod(F.xxhash64(F.col(col)), F.lit(shards)).alias("shard")
    return (
        stream.select(shard, F.col(col).cast("string").alias(col))
        .groupBy("shard")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "shard bigint, item string, mg_lower bigint, "
                "shard_rows bigint"
            ),
            stateStructType=(
                "items array<string>, counts array<bigint>, "
                "shard_rows bigint"
            ),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def last_emission_collector():
    """The foreachBatch companion of
    :func:`streaming_heavy_hitter_candidates` (and any update-mode
    per-shard emitter): update mode re-emits a shard's FULL current
    rows every batch that touches it, so only the LAST batch that
    touched each shard is current — earlier emissions are stale
    (conflicting ``mg_lower``, evicted items, old ``shard_rows``).

    Returns ``(sink, final_rows)``: pass ``sink`` to
    ``writeStream.foreachBatch``; after the query drains,
    ``final_rows()`` yields each shard's rows from the last batch that
    touched it (sorted by shard). One authoritative implementation —
    the per-shard tuple-reset-on-batch-change logic is subtle enough
    that the declared queries and tests must not each carry a copy."""
    by_shard: dict = {}

    def sink(df, batch_id):
        for r in df.collect():
            cur = by_shard.setdefault(r["shard"], (batch_id, []))
            if cur[0] != batch_id:
                cur = (batch_id, [])
                by_shard[r["shard"]] = cur
            cur[1].append(r)

    def final_rows():
        return [
            r
            for _, (_, rows) in sorted(by_shard.items())
            for r in rows
        ]

    return sink, final_rows
