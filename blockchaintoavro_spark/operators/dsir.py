"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) over hashed n-gram features, the published recipe for picking
pretraining documents that "look like" a high-quality target corpus.

Three stages, each in the engine's bounded-model idiom (the
hashed_linear_score / train_bpe pattern — iterate/collect only the
KB-sized model, never the corpus):

1. :func:`fit_dsir_logratios` — fit smoothed hashed-bigram bag-of-words
   bucket distributions on a TARGET corpus (what you want more of) and a
   SOURCE corpus (the raw pool), returning per-bucket log probability
   ratios in milli-nats. Two bounded-key shuffles (``n_buckets`` distinct
   keys, map-side partials) + two O(n_buckets) collects.
2. :func:`dsir_logweights` — per-document importance log-weight
   ``log p_target(doc)/p_source(doc)`` as ONE zero-shuffle whole-stage
   projection: the grams array is scored in place by an aggregate HOF
   against the array-literal model; nothing explodes, nothing shuffles.
3. :func:`dsir_sample` — sample ``k`` documents WITHOUT replacement with
   probability proportional to their importance weight via the Gumbel
   top-k trick (key = log-weight + Gumbel noise; take the k largest).
   The noise is derived deterministically from a md5 of the document id,
   so runs are reproducible and both engines of the correctness harness
   compute identical keys. Selection is ``orderBy(...).limit(k)`` —
   Spark's TakeOrderedAndProject (per-partition partial top-k + driver
   merge of k rows per partition), never a single-partition window.

Feature map: unigrams + joining-space bigrams of the whitespace-lowered
tokenization, each hashed to ``bucket = md5-prefix-32bit % n_buckets``
— the same engine-portable hash :func:`hashed_linear_score` uses, so
DuckDB reproduces it with ``('0x' || substr(md5(g),1,8))::UBIGINT``.

Scale: the sweep leg (logweights + sample) touches the corpus exactly
once with a narrow projection and ships only per-partition top-k rows to
the driver; the fit leg's shuffles carry ``n_buckets`` keys regardless of
corpus size. At 100 TB you fit on samples of target/source (as the paper
does) and sweep the full pool — the zero-shuffle leg.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import _feature_bucket

__all__ = [
    "fit_dsir_logratios",
    "dsir_logweights",
    "dsir_sample",
]

# deterministic pseudo log-ratio model (milli-nats) used when no fitted
# vector is supplied — a Knuth-style multiplicative scramble the DuckDB
# oracle replicates with plain integer arithmetic
_PSEUDO_MULT = 2654435761
_PSEUDO_ADD = 999331


def _grams_of(toks: Column, include_bigrams: bool = True) -> Column:
    """Unigrams + space-joined bigrams of an ALREADY-SPLIT token array
    (the DSIR paper's hashed-bigram featurization).

    ``toks`` must be an attribute (a projected column), not an inline
    ``split`` expression: higher-order functions are CodegenFallback —
    interpreted, no common-subexpression elimination — so an inline
    split inside the bigram lambda re-splits the text once per element
    (O(words²), the with_dup_ngram_ratio r16 finding).

    ``sequence(1, 0)`` would count DOWN in Spark, so the bigram leg is
    gated on ``size >= 2`` instead of relying on an empty sequence.
    """
    if not include_bigrams:
        return toks
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _split_toks(text_col: Column) -> Column:
    """The shared tokenization: ``split(lower(text), ' ')``."""
    return F.split(F.lower(text_col), " ")


def fit_dsir_logratios(
    target: DataFrame,
    source: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    include_bigrams: bool = True,
    text_col: str = "text",
    hash_fn: str = "md5",
) -> list[int]:
    """Fit the per-bucket importance log-ratio vector
    ``log p_target(b) - log p_source(b)`` over hashed n-gram buckets,
    with add-``alpha`` smoothing so buckets unseen in either corpus stay
    finite. Returns integer milli-nats (length ``n_buckets``) —
    :func:`dsir_logweights` consumes it as an array literal.

    Each corpus contributes one explode → ``groupBy(bucket)`` count:
    a bounded-key shuffle (``n_buckets`` distinct keys, map-side
    partials make the Exchange carry ~``n_buckets`` rows per task) and
    an O(``n_buckets``) driver collect. The corpus itself is never
    collected; fit on samples at 100 TB exactly as the paper does.
    """

    def bucket_counts(df: DataFrame) -> tuple[dict[int, int], int]:
        # token array projected to an attribute FIRST (r16): an inline
        # split inside the bigram lambda would re-split per element
        rows = (
            df.select(_split_toks(F.col(text_col)).alias("_t"))
            .select(
                F.explode(
                    _grams_of(F.col("_t"), include_bigrams)
                ).alias("g")
            )
            .select(
                _feature_bucket(F.col("g"), n_buckets, hash_fn).alias("b")
            )
            .groupBy("b")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {r["b"]: r["c"] for r in rows}
        return counts, sum(counts.values())

    t_counts, t_total = bucket_counts(target)
    s_counts, s_total = bucket_counts(source)
    t_denom = t_total + n_buckets * alpha
    s_denom = s_total + n_buckets * alpha
    out = []
    for b in range(n_buckets):
        lr = math.log((t_counts.get(b, 0) + alpha) / t_denom) - math.log(
            (s_counts.get(b, 0) + alpha) / s_denom
        )
        out.append(int(round(lr * 1000)))
    return out


def _logweight_expr(
    grams: Column,
    lr_milli: list[int] | None,
    n_buckets: int,
    hash_fn: str = "md5",
) -> tuple[Column, Column | None]:
    """(score expression over a grams array, optional model literal to
    attach via a broadcast one-row frame)."""
    if lr_milli is None:
        def lr(g):
            return (
                _feature_bucket(g, n_buckets, hash_fn) * F.lit(_PSEUDO_MULT)
                + _PSEUDO_ADD
            ) % 2001 - 1000

        expr = F.aggregate(
            grams, F.lit(0).cast("long"), lambda acc, g: acc + lr(g)
        )
        return expr, None
    if len(lr_milli) != n_buckets:
        raise ValueError(
            f"lr_milli length {len(lr_milli)} != n_buckets {n_buckets}"
        )
    warr = F.array(*[F.lit(int(v)).cast("long") for v in lr_milli])
    expr = F.aggregate(
        grams,
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.element_at(
            F.col("_lr"),
            (_feature_bucket(g, n_buckets, hash_fn) + 1).cast("int"),
        ),
    )
    return expr, warr


def dsir_logweights(
    df: DataFrame,
    lr_milli: list[int] | None = None,
    n_buckets: int = 4096,
    include_bigrams: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document DSIR importance log-weight — the sum of its hashed
    n-gram buckets' log probability ratios — as one zero-shuffle
    whole-stage-codegen projection: ``(id, n_grams, logw_milli)``.

    ``lr_milli`` is the fitted vector from :func:`fit_dsir_logratios`
    (milli-nats); it rides the plan as an array literal on a broadcast
    one-row frame, never a per-gram join. ``None`` selects the
    deterministic pseudo-model the declared-query oracle replicates.

    Integer milli-nat scoring end to end — no float summation-order or
    libm divergence can flip a value between engines. ``keep_cols``
    appends pass-through input columns for join-free composition.
    """
    base = df
    if lr_milli is not None:
        # length-validated inside _logweight_expr below
        _probe_expr, warr = _logweight_expr(
            F.array().cast("array<string>"), lr_milli, n_buckets, hash_fn
        )
        model = df.sparkSession.range(1).select(warr.alias("_lr"))
        base = df.join(F.broadcast(model))
    # r16 (guide §1.2 applied to the expression tree): tokens and grams
    # are projected to ATTRIBUTES in their own projections — each is
    # referenced more than once downstream, so CollapseProject keeps the
    # chain and every interpreted HOF runs once per row. The previous
    # single-Column form re-ran the gram build for n_grams AND the
    # score, and the inline split inside the bigram lambda re-split the
    # text per element (O(words²)) — measured 16.5 → ~1 CPU-s on
    # x_dsir_weights at sf0.1. Rows are bit-identical (same expressions,
    # same evaluation order, over attribute references).
    s0 = base.withColumn("_dw_toks", _split_toks(F.col(text_col)))
    s1 = s0.withColumn(
        "_dw_grams", _grams_of(F.col("_dw_toks"), include_bigrams)
    )
    expr, _ = _logweight_expr(
        F.col("_dw_grams"), lr_milli, n_buckets, hash_fn
    )
    return s1.select(
        F.col(id_col),
        F.size("_dw_grams").cast("long").alias("n_grams"),
        expr.alias("logw_milli"),
        *[F.col(c) for c in keep_cols],
    )


def dsir_sample(
    df: DataFrame,
    k: int,
    lr_milli: list[int] | None = None,
    n_buckets: int = 4096,
    include_bigrams: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Gumbel top-k resampling: select ``k`` documents without
    replacement with probability proportional to ``exp(logweight)`` —
    the DSIR paper's resampling stage. Returns
    ``(id, n_grams, logw_milli, gkey)`` for the selected rows, where
    ``gkey = logw + Gumbel(doc)`` rounded to 4 decimals (the engine
    output-boundary contract for transcendental floats).

    The Gumbel draw is deterministic per document:
    ``u = (md5_32(cast(id as string)) + 0.5) / 2^32`` then
    ``g = -ln(-ln(u))`` — reproducible across runs and engines, so the
    "sample" is a pure function of the corpus (re-fit ⇒ same selection,
    the property every audit of a training-data pipeline wants).

    Selection is ``orderBy(gkey desc, id).limit(k)`` → Spark plans
    TakeOrderedAndProject: each scan partition keeps its own k, the
    driver merges ``k × n_partitions`` rows — no global sort Exchange,
    no single-partition window. The ordering key is the ROUNDED gkey
    (ties broken by id), so both engines of the correctness harness
    agree on the boundary row even if their ``ln`` differ in the last
    ulp.
    """
    w = dsir_logweights(
        df, lr_milli, n_buckets, include_bigrams, id_col, text_col, hash_fn
    )
    h = _feature_bucket(F.col(id_col).cast("string"), 1 << 32, "md5")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    gkey = (
        F.round(F.col("logw_milli") / F.lit(1000.0) + gumbel, 4)
        .cast("decimal(38,4)")
        .cast("double")
    )
    return (
        w.withColumn("gkey", gkey)
        .orderBy(F.col("gkey").desc(), F.col(id_col))
        .limit(k)
    )
