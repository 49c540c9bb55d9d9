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
