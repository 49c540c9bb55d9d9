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

import json
from typing import Any, Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Versioned state envelope (VERDICT r14 #3)
#
# Spark's state-store schema check rejects ANY change to the
# ``stateStructType`` of an ``applyInPandasWithState`` operator on
# checkpoint resume — adding a field, however compatible, strands every
# existing checkpoint (the r13→r14 ``shard_rows`` widening did exactly
# that). A version FIELD inside a widening tuple therefore cannot help:
# the check fails before user code sees the state. The convention that
# does survive widenings is an OPAQUE ENVELOPE — the Spark-visible state
# schema is frozen forever at ``version int, blob binary`` and every
# evolution happens inside the blob, migrated on read by version number.
# Stateful operators that expect to evolve should use this pair.

STATE_ENVELOPE_SCHEMA = "version int, blob binary"


class state_partitions:
    """Scope ``spark.sql.shuffle.partitions`` to the KEY CARDINALITY of
    a stateful streaming query for the duration of its run (r16, guide
    §2.4): a stateful operator keyed on ``shards`` distinct values
    never populates more than ``shards`` state partitions, but Spark
    sizes the state Exchange from the session's shuffle partitions —
    every EXTRA partition still runs a task and opens/commits a state
    store per micro-batch (measured: 32 partitions × 3 batches with 8
    live shards ≈ half the query's CPU). The partition count is frozen
    into the checkpoint at the first batch, so this must wrap
    ``start()``; use only with a FRESH checkpoint (resuming an existing
    checkpoint keeps its recorded count regardless).

    Derived from the operator's shard parameter — not the local core
    count — so the same code is right at any cluster size.
    """

    def __init__(self, spark, n: int) -> None:
        self._spark, self._n = spark, int(n)

    def __enter__(self):
        self._old = self._spark.conf.get("spark.sql.shuffle.partitions")
        self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))
        return self

    def __exit__(self, *exc) -> None:
        self._spark.conf.set("spark.sql.shuffle.partitions", self._old)


def encode_state(version: int, payload) -> tuple[int, bytes]:
    """Pack a JSON-serializable payload into the frozen envelope shape."""
    return int(version), json.dumps(
        payload, separators=(",", ":")
    ).encode("utf-8")


def decode_state(
    state_tuple,
    current_version: int,
    migrations: dict[int, Callable] | None = None,
) -> Any:
    """Unpack an envelope written by THIS or ANY EARLIER version of the
    operator: ``migrations[v]`` lifts a version-``v`` payload to
    ``v+1``; they are applied in sequence until ``current_version``. A
    version with no registered migration, or a version NEWER than the
    code (a downgrade resume), raises with the remediation instead of
    silently misreading state."""
    version, blob = int(state_tuple[0]), state_tuple[1]
    payload = json.loads(
        blob if isinstance(blob, (bytes, bytearray)) else bytes(blob)
    )
    while version < current_version:
        mig = (migrations or {}).get(version)
        if mig is None:
            raise ValueError(
                f"no migration registered from state version {version} "
                f"to {version + 1} (current: {current_version}); restart "
                "on a fresh checkpoint and replay the source"
            )
        payload = mig(payload)
        version += 1
    if version != current_version:
        raise ValueError(
            f"checkpoint state version {version} is newer than this "
            f"code's {current_version} — resume with the newer code or "
            "restart on a fresh checkpoint"
        )
    return payload


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


# Payload versions of running_user_totals' envelope: v1 = [n, total].
# A future widening bumps the version, appends to the payload, and
# registers {1: lambda p: p + [new_default]} — the Spark-visible
# schema stays STATE_ENVELOPE_SCHEMA and old checkpoints keep resuming.
_TOTALS_STATE_VERSION = 1
_TOTALS_STATE_MIGRATIONS: dict[int, Callable] = {}


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running per-key (count, sum) maintained as explicit group state.

    Every micro-batch emits the updated running totals for keys seen in
    that batch (output mode ``update``). The final emission per key equals
    the batch ``groupBy(key).agg(count, sum)`` over the same data.

    COMPATIBILITY (VERDICT r15 #2): state rides the frozen versioned
    envelope (:data:`STATE_ENVELOPE_SCHEMA`) like the heavy-hitter
    operator — the raw ``n bigint, total double`` stateStructType it
    shipped with through r15 would strand every checkpoint on the next
    widening (Spark rejects ANY stateStructType change on resume).
    Adopting the envelope is itself the one-time, final schema change:
    an r15-or-earlier checkpoint of this operator cannot be resumed by
    this version (the loud state-schema error is pinned in
    tests/test_streaming.py); restart on a fresh checkpoint and replay
    the source.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = decode_state(
                state.get, _TOTALS_STATE_VERSION, _TOTALS_STATE_MIGRATIONS
            )
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update(encode_state(_TOTALS_STATE_VERSION, [n, total]))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, n bigint, total double",
        stateStructType=STATE_ENVELOPE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Payload versions of streaming_heavy_hitter_candidates' envelope:
# v3 = [items, counts, shard_rows] (the r14 3-field shape, enveloped).
# A future widening bumps the version, appends to the payload, and
# registers a migration {3: lambda p: p + [new_default]} here — the
# Spark-visible schema stays STATE_ENVELOPE_SCHEMA and old checkpoints
# keep resuming.
_HH_STATE_VERSION = 3
_HH_STATE_MIGRATIONS: dict[int, Callable] = {}


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
    ``col`` must be a string column.

    COMPATIBILITY: the state now rides the frozen versioned envelope
    (``version int, blob binary`` — :data:`STATE_ENVELOPE_SCHEMA`), so
    FUTURE payload evolutions migrate on read instead of stranding
    checkpoints the way the r13→r14 ``shard_rows`` widening did.
    Adopting the envelope is itself a one-time, final schema change: a
    checkpoint written by the r13 (2-field) or r14 (3-field) plain
    schemas cannot be resumed by this version (Spark's state-store
    schema check fails the restart — the exact error is pinned in
    tests/test_streaming.py). Restart such a query on a FRESH
    checkpoint and replay the source; the exactly-once store fences
    make the replay idempotent downstream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.heavyhitters import mg_add

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, seen = decode_state(
                state.get, _HH_STATE_VERSION, _HH_STATE_MIGRATIONS
            )
        else:
            items, counts, seen = [], [], 0
        counters = dict(zip(items, counts))
        for pdf in pdfs:
            vc = pdf[col].dropna().value_counts()
            for item, w in vc.items():
                mg_add(counters, item, int(w), k)
                seen += int(w)
        state.update(
            encode_state(
                _HH_STATE_VERSION,
                [
                    list(counters),
                    [int(v) for v in counters.values()],
                    int(seen),
                ],
            )
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
            stateStructType=STATE_ENVELOPE_SCHEMA,
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
    the per-shard replacement logic is subtle enough that the declared
    queries and tests must not each carry a copy.

    Each sink invocation REBUILDS every shard entry it touches
    (collect the call's rows per shard locally, then overwrite) rather
    than appending under a reset-on-batch-id-change: foreachBatch
    RETRIES a failed batch under the SAME batch_id, so append-with-
    reset would keep the failed attempt's rows alongside the retry's —
    duplicate (shard, item) rows in ``final_rows()`` (ADVICE r14 #1)."""
    by_shard: dict = {}

    def sink(df, batch_id):
        rows_by_shard: dict = {}
        for r in df.collect():
            rows_by_shard.setdefault(r["shard"], []).append(r)
        for shard, rows in rows_by_shard.items():
            by_shard[shard] = (batch_id, rows)

    def final_rows():
        return [
            r
            for _, (_, rows) in sorted(by_shard.items())
            for r in rows
        ]

    return sink, final_rows
