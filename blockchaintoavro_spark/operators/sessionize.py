"""Batch sessionization — gaps-and-islands with a strict gap threshold.

SURVEY §2.3-E ST4 / DQ-30. A new session starts when the time since the
previous event of the same key is STRICTLY greater than the gap (ties on
the boundary stay in-session). Streaming equivalent: ``session_window``
(streaming/windows.py); this batch form is the oracle-checkable one.

Scale: one Exchange on key + per-key sort (two stacked window functions on
the same (key, order) spec share a single sort — check the plan: one
Exchange, one Sort, one Window node chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Return ``df`` + ``session_id`` (1-based per key, ordered by ts)."""
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    micros = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | ((micros - prev) > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    return df.withColumn("session_id", F.sum(new_session).over(run))
