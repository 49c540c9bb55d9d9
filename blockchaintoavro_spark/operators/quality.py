"""Corpus-quality operators for training-data pipelines (SURVEY §2.7 X4
extension): deterministic dataset splitting, repetition scoring (the
Gopher/C4-style duplicate-n-gram filter), and deterministic stratified
sampling for data mixing.

All three are pure column expressions / narrow transformations — no
shuffle, no UDF — so at 100 TB they pipeline inside the parquet scan
stage and cost only the md5 / array arithmetic per row. Determinism is
the point: the same row lands in the same split / sample on every run,
on any cluster size, with no RNG state to coordinate — which is what
makes train/val/test assignment reproducible across re-runs of a 1000-
executor job and oracle-checkable in SQL (DuckDB computes the identical
md5 hex).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..session import tiny_df
from pyspark.sql import types as T


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``(id, rn, term, tfidf)`` with
    smooth idf ``ln((1+N)/(1+df)) + 1`` and tfidf rounded to 4 dp (the
    rounded value is also the ranking key, term-asc tiebreak, so engine
    and oracle can never disagree on ordering at the boundary).

    Scale: term counts partial-aggregate map-side before their one
    shuffle; the df join runs on the aggregated (doc,term) table (AQE
    broadcasts the vocabulary side when it fits); the corpus size N is a
    broadcast single-row cross join, not a driver collect. The final
    window ranks the *aggregated* counts, never raw tokens, and the
    ``rn <= k`` filter compiles to WindowGroupLimit (partial top-k below
    the sort).
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("_df"))
    n = toks.agg(F.countDistinct(id_col).alias("_n"))
    idf = F.log((1.0 + F.col("_n")) / (1.0 + F.col("_df"))) + 1.0
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            F.round(F.col("_tf") * idf, 4)
            .cast("decimal(38,4)")
            .cast("double")
            .alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(id_col, "rn", "term", "tfidf")
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram-LM cross-entropy in bits/token — the
    CCNet-style fluency/quality signal (low = natural text, high =
    gibberish or vocabulary the LM has never seen).

    ``lm`` is a ``(tk, _c, _n)`` token-count table (count + corpus
    total); by default it is fit on ``docs`` itself, but a real pipeline
    passes the LM fit on a clean reference corpus and persists it
    between runs. Out-of-vocabulary tokens are NOT dropped (an inner
    join would exclude them from the average and make an all-OOV
    gibberish document vanish entirely — review r2 finding): they score
    the floor probability ``1/(N+1)``, the most-surprising signal the
    LM can emit, so unseen-vocabulary documents land at the top of the
    bits/token ranking exactly as the docstring promises. Returns
    ``(id, n_tokens, bits_per_token)``.

    Scale: the LM collapses to one row per distinct token before
    anything joins it — the vocabulary is broadcast when it fits
    (``broadcast_vocab``), else the probe is a token-keyed equi-join
    (postings-shaped, linear). The per-doc average partial-aggregates
    map-side over the exploded tokens (a doc's tokens stay in its scan
    partition), so the doc-keyed shuffle carries ~one row per doc.
    """
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tk")
    )
    if lm is None:
        cnt = toks.groupBy("tk").agg(F.count("*").alias("_c"))
        tot = cnt.agg(F.sum("_c").alias("_n"))
        lm = cnt.crossJoin(F.broadcast(tot))
        # reuse the already-computed total: aggregating max(_n) over lm
        # would re-plan the whole tokenize+count subtree a second time
        n_total = tot.select(F.col("_n").alias("_nt"))
    else:
        n_total = lm.agg(F.max("_n").alias("_nt"))
    probe = F.broadcast(lm) if broadcast_vocab else lm
    # corpus total as a one-row broadcast so OOV rows (null _c/_n after the
    # left join) still know N for the floor probability
    nll = F.when(
        F.col("_c").isNotNull(),
        -F.log2(F.col("_c").cast("double") / F.col("_n").cast("double")),
    ).otherwise(-F.log2(1.0 / (F.col("_nt").cast("double") + 1.0)))
    return (
        toks.join(probe, "tk", "left")
        .crossJoin(F.broadcast(n_total))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg(nll).alias("bits_per_token"),
        )
    )


def score_buckets(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style quality bucketing: rank every row by ``score_col``
    (ascending — low perplexity first) and split into ``len(labels)``
    equal tiles. Rank-based tiling is *boundary-exact across engines*:
    the (score, id) ordering is a total order, so no float-threshold
    comparison can flip a row's bucket between Spark and an oracle.

    Scale cliff (deliberate, same as dq34's exact percentiles): the
    un-partitioned ntile needs a global sort of the per-doc score table.
    At 100 TB use :func:`threshold_buckets` with cutoffs from
    ``approx_percentile`` or a held-out calibration corpus — CCNet's
    actual production shape (fixed perplexity cutoffs).
    """
    from pyspark.sql import Window

    k = len(labels)
    w = Window.orderBy(F.asc(score_col), F.asc(id_col))
    tile = F.ntile(k).over(w)
    label = F.lit(labels[-1])
    for i in range(k - 1, 0, -1):
        label = F.when(tile == i, labels[i - 1]).otherwise(label)
    return scored.withColumn("bucket", label)


def threshold_buckets(
    scored: DataFrame,
    score_col: str,
    cutoffs: Sequence[float],
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """Production bucketing: fixed score cutoffs (ascending), row-local
    CASE — zero shuffle, pipelines in the scan stage at any scale.
    ``len(labels) == len(cutoffs) + 1``; row goes to the first label
    whose cutoff its score is ``<=``.
    """
    if len(labels) != len(cutoffs) + 1:
        raise ValueError("need len(labels) == len(cutoffs) + 1")
    label = F.lit(labels[-1])
    for i in range(len(cutoffs) - 1, -1, -1):
        label = F.when(F.col(score_col) <= cutoffs[i], labels[i]).otherwise(label)
    return scored.withColumn("bucket", label)


def _hash_bucket(key: Column) -> Column:
    """First two md5 hex chars of the key's string form: a uniform,
    engine-portable 256-bucket hash (lexicographic threshold = fraction).
    """
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)


def _md5_bucket(key: Column, n_buckets: int) -> Column:
    """32-bit md5-prefix hash of ``key`` mod ``n_buckets`` — the
    engine-portable feature hash the model-based operators share
    (hashed_linear_score, DSIR). DuckDB reproduces it with
    ``('0x' || substr(md5(k), 1, 8))::UBIGINT % n``."""
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n_buckets
    )


def _feature_bucket(key: Column, n_buckets: int, hash_fn: str) -> Column:
    """Shared feature hash with two implementations: ``"md5"`` (default
    — engine-portable, what every oracle recomputes) and ``"xxhash64"``
    (production — one native JVM hash returning a long, no hex-string
    materialization; ~an order of magnitude cheaper per feature, the
    right choice for a 100 TB sweep where no cross-engine replay is
    needed). Models are hash-specific: train and serve with the SAME
    ``hash_fn``."""
    if hash_fn == "md5":
        return _md5_bucket(key, n_buckets)
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (md5|xxhash64)")


def hash_split(
    key: Column,
    boundaries: Sequence[tuple[str, str]] = (("train", "cd"), ("val", "e6")),
    last: str = "test",
) -> Column:
    """Deterministic train/val/test assignment from a stable key.

    ``boundaries`` are (label, exclusive upper hex-pair) in ascending
    order; rows past the final boundary get ``last``. The defaults give
    ~80/10/10. Rows never migrate between splits when data is appended —
    assignment depends only on the key, unlike sort- or rand()-based
    splits which reshuffle membership on every run.
    """
    bucket = _hash_bucket(key)
    expr = F.lit(last)
    for label, upper in reversed(list(boundaries)):
        _check_hex_pair(upper)
        expr = F.when(bucket < upper, label).otherwise(expr)
    return expr


def _check_hex_pair(s: str) -> None:
    """Thresholds compare lexicographically against a 2-LOWERCASE-hex
    bucket — any other shape ('100', 'CD', 'c') silently misassigns
    rows instead of erroring, so refuse it loudly (same contract as
    split.py's 8-char validation)."""
    if not (
        isinstance(s, str)
        and len(s) == 2
        and all(c in "0123456789abcdef" for c in s)
    ):
        raise ValueError(
            f"threshold {s!r} is not a 2-char lowercase hex pair"
        )


def dup_ngram_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that are duplicates of an earlier n-gram
    in the same document — the classic repetition quality filter (high
    ratio = boilerplate / degenerate text). 0.0 for docs with < n tokens.

    Entirely JVM-side HOFs (split / transform / array_distinct): a narrow
    per-row expression with no Python round-trip.
    """
    # one authoritative gram expression shared with the DataFrame form
    # (_word_ngrams) — the bit-identity promise between the two forms
    # depends on it (r16 review finding)
    grams = _word_ngrams(F.split(F.lower(text), " "), n)
    total = F.size(grams)
    dups = total - F.size(F.array_distinct(grams))
    return F.when(total == 0, F.lit(0.0)).otherwise(dups / total)


def _word_ngrams(toks: Column, n: int) -> Column:
    """Word ``n``-grams of a pre-split token array (empty when < n)."""
    nt = F.size(toks)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        nt >= n, F.transform(F.sequence(F.lit(1), nt - (n - 1)), gram)
    ).otherwise(F.array().cast("array<string>"))


def with_dup_ngram_ratio(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out_col: str = "dup_ngram_ratio",
) -> DataFrame:
    """``df`` plus ``out_col`` = :func:`dup_ngram_ratio` of ``text_col`` —
    the DataFrame form that evaluates each heavy HOF ONCE per row.

    Why this exists (r16, guide §1.2 "distributed algorithm" applied to
    the expression tree): higher-order functions (``transform`` /
    ``aggregate`` / ``array_distinct`` over lambdas) are CodegenFallback
    — Spark evaluates them interpreted, with no common-subexpression
    elimination across a projection. The single-Column form references
    its ``grams`` subtree three times (two ``size`` calls and the
    zero-guard), so every reference re-runs the whole O(words) gram
    build per row; a query that also folds the ratio into a keep flag
    doubles it again. Measured on x_gopher_rules at sf0.1: 64.9 → 1.6
    CPU-s (wall 62 → 1.0 s) from restructuring alone.

    Mechanism: each heavy subexpression (token split, gram transform,
    gram counts) is produced as a named alias in its own projection and
    *referenced more than once* downstream — Catalyst's CollapseProject
    refuses to inline a non-cheap alias with multiple consumers, so the
    chain survives optimization and each HOF runs once. Output rows are
    bit-identical to the Column form (same expressions, same order).
    """
    # the token array MUST be projected to an attribute before feeding
    # the gram transform: an inline split expression inside the
    # transform's lambda re-splits the text per gram element (O(words²))
    s0 = df.withColumn(
        "_dnr_toks", F.split(F.lower(F.col(text_col)), " ")
    )
    s1 = s0.withColumn(
        "_dnr_grams", _word_ngrams(F.col("_dnr_toks"), n)
    ).drop("_dnr_toks")
    return _with_dup_ratio_from_grams(s1, "_dnr_grams", out_col)


def _with_dup_ratio_from_grams(
    df: DataFrame, grams_col: str, out_col: str
) -> DataFrame:
    """``out_col`` = duplicated-gram ratio of an already-staged gram
    ARRAY attribute, with the two sizes staged once and the temp columns
    dropped — the shared tail of :func:`with_dup_ngram_ratio` and
    :func:`with_gopher_metrics` (one authoritative implementation; the
    two must stay expression-identical for the shared oracle semantics —
    r16 review finding)."""
    total, distinct = f"_dgr_tot_{out_col}", f"_dgr_dst_{out_col}"
    s = df.select(
        "*",
        F.size(grams_col).alias(total),
        F.size(F.array_distinct(grams_col)).alias(distinct),
    ).drop(grams_col)
    ratio = F.when(F.col(total) == 0, F.lit(0.0)).otherwise(
        (F.col(total) - F.col(distinct)) / F.col(total)
    )
    return s.withColumn(out_col, ratio).drop(total, distinct)


def with_gopher_metrics(
    df: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] = ("the", "a", "of", "to", "and", "in"),
) -> DataFrame:
    """``df`` plus the four :func:`gopher_metrics` columns (``n_words``,
    ``mean_word_len``, ``dup3_ratio``, ``n_stop_hits``) with every heavy
    HOF evaluated ONCE per row — the corpus-scale form of the metric
    suite (see :func:`with_dup_ngram_ratio` for the CollapseProject
    mechanism and the measured 40× CPU difference vs re-deriving each
    metric from the Column API per output column). Downstream keep
    flags should reference these output columns (cheap attributes)
    rather than re-invoking :func:`gopher_metrics`.
    """
    s1 = df.withColumn(
        "_gm_toks", F.split(F.lower(F.col(text_col)), " ")
    )
    tk = F.col("_gm_toks")
    nt = F.size(tk)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    s2 = s1.select(
        "*",
        nt.cast("long").alias("n_words"),
        F.when(nt == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(tk, F.lit(0.0), lambda acc, x: acc + F.length(x)) / nt
        )
        .alias("mean_word_len"),
        F.size(F.filter(tk, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stop_hits"),
        _word_ngrams(tk, 3).alias("_gm_g3"),
    ).drop("_gm_toks")
    return _with_dup_ratio_from_grams(s2, "_gm_g3", "dup3_ratio")


def stratified_keep(
    key: Column, stratum: Column, fractions: Mapping[str, str], default: str = "00"
) -> Column:
    """Deterministic per-stratum sampling predicate for data mixing:
    keep a row iff its 256-bucket hash falls below the stratum's hex-pair
    threshold (e.g. ``{"en": "34"}`` keeps ~20% of English rows).

    The sampling decision is a row-local filter evaluated inside the scan
    stage — at 100 TB this downsamples each domain to its mixing weight
    before any shuffle touches the data, and re-runs select the identical
    rows (unlike ``df.sampleBy``, whose membership depends on seed +
    partitioning).
    """
    bucket = _hash_bucket(key)
    _check_hex_pair(default)
    thresh = F.lit(default)
    for value, upper in fractions.items():
        _check_hex_pair(upper)
        thresh = F.when(stratum == value, upper).otherwise(thresh)
    return bucket < thresh


def pack_sequences(
    df: DataFrame,
    token_count: Column,
    budget: int,
    shard: str,
    order: str,
) -> DataFrame:
    """Concatenate-and-split sequence packing for LLM pretraining: within
    each shard, documents are laid end-to-end in ``order`` and cut into
    fixed ``budget``-token sequences (documents may straddle a boundary —
    the standard pretraining concatenation). Emits ``seq_id`` (which
    packed sequence the document starts in) and ``seq_offset`` (token
    position within it).

    One shuffle + sort per shard (a running sum over an ordered window).
    At 100 TB the shard column bounds the sort: shard by
    hash_split-style buckets (or lang/domain) so each window is an
    independent, executor-sized sequential scan — there is never a global
    ordering, which is what makes this packing deterministic AND
    distributed. Downstream, (shard, seq_id) is the training-sequence key.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_count).over(w), F.lit(0))
    return df.select(
        shard,
        order,
        token_count.cast("long").alias("n_tok"),
        F.floor(cum_before / budget).cast("long").alias("seq_id"),
        (cum_before % budget).cast("long").alias("seq_offset"),
    )


# ---------------------------------------------------------------------------
# PII redaction

# Dialect-portable patterns: every construct here (character classes, bounded
# and {n,} repetition, \b, \d) means the same thing to Java regex (Spark) and
# RE2 (DuckDB), so the oracle can replay the redaction verbatim. Order
# matters: each rule counts on the text as left by the previous rule, and
# replacement tags contain no digits/@ so later rules never match inside an
# earlier redaction.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d -]{5,14}\d", "<PHONE>"),
)


def redact_pii(text: Column) -> dict[str, Column]:
    """Sequential count-and-redact of email / IPv4 / phone patterns.

    Returns ``{"n_email": .., "n_ip": .., "n_phone": .., "redacted": ..}``
    where each count reflects what that rule actually removed. Pure JVM
    ``regexp_extract_all`` / ``regexp_replace`` chain — row-local, zero
    shuffle, pipelines inside the scan stage at any scale.
    """
    out: dict[str, Column] = {}
    cur = text
    for name, pat, tag in PII_RULES:
        out[f"n_{name}"] = (
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        )
        cur = F.regexp_replace(cur, pat, tag)
    out["redacted"] = cur
    return out


def budget_mixture(
    df: DataFrame,
    token_count: Column,
    budgets: Mapping[str, int],
    source: str = "source",
    key: str = "doc_id",
    default_budget: int = 0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Token-budget data mixing: deterministically select documents per
    source until that source's token budget is met (the straddling
    document is kept), e.g. "2B tokens of web, 500M of code" recipes.

    Selection order within a source is md5(key) — a deterministic shuffle,
    so re-runs and different cluster sizes pick the identical subset, and
    the pick is unbiased w.r.t. ingestion order.

    Determinism caveat (r8 ADVICE): the identical-subset guarantee needs
    UNIQUE, NON-NULL keys. Rows sharing a key (including several NULL-key
    rows, which all pin to bucket 0) tie completely in the ordering, so
    which of them straddles a budget boundary is nondeterministic across
    runs — everything strictly below the boundary is still stable.
    Callers whose corpus can carry duplicate or NULL keys at a boundary
    pass ``tiebreak`` — a stable column appended LAST in the selection
    order — which makes the order total and the subset identical across
    runs and partitionings (r9 VERDICT #6).

    Scale shape (r7, the same prefix-bucket construction as
    :func:`temperature_mixture`): a 4096-cell md5-prefix histogram of
    per-(source, bucket) token sums (one aggregate pass, driver-side
    model) locates each source's boundary bucket — the first whose
    cumulative token sum reaches the budget. Buckets past the boundary
    are dropped by a pure filter BEFORE the window, and the cumsum
    window partitions by (source, bucket), so the largest window task
    holds ~1/4096 of a source instead of all of it. Each row's exact
    global ``cum_before`` is the driver-known sum of its source's lower
    buckets plus the within-bucket running sum — identical values to a
    whole-source window, without its single-task ceiling.
    """
    from pyspark.sql import Window

    if tiebreak and tiebreak in (key, source):
        raise ValueError(
            f"tiebreak column {tiebreak!r} must differ from key/source"
        )
    n_buckets = 4096
    h = F.md5(F.col(key).cast("string"))
    # a NULL key has a NULL md5 — pin it to bucket 0 so it stays
    # selectable and sorts exactly where the legacy whole-source window
    # put it (orderBy(_h) ascending is NULLS FIRST, i.e. before every
    # bucket-0 string) instead of silently vanishing through the lookup
    # join (r7 ADVICE)
    bucket = F.coalesce(
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int"), F.lit(0)
    )
    tok = token_count.cast("long")
    cells = (
        df.groupBy(F.col(source).alias("_s"), bucket.alias("_b"))
        .agg(F.sum(tok).alias("t"))
        .collect()
    )
    per_bucket: dict = {}
    sources: set = set()
    for r in cells:
        per_bucket[(r["_s"], r["_b"])] = r["t"] or 0
        sources.add(r["_s"])

    def budget_of(s) -> int:
        # a source missing from ``budgets`` (including NULL, which the
        # legacy when-chain also defaulted) gets ``default_budget``
        return budgets.get(s, default_budget)

    # driver walk: per source, one lookup row per kept bucket carrying
    # the source's token sum BELOW that bucket (the exact global
    # cum_before offset); the walk stops at the boundary bucket where
    # the budget fills, so buckets past it simply have no lookup row
    # and the broadcast join doubles as the bulk filter
    lookup_rows: list = []
    for s in sources:
        b_lim = budget_of(s)
        cum = 0
        for bkt in range(n_buckets):
            t = per_bucket.get((s, bkt), 0)
            lookup_rows.append((s, bkt, cum))
            if cum + t >= b_lim:
                break
            cum += t
    spark = df.sparkSession
    src_field = df.schema[source]
    lookup_schema = T.StructType(
        [
            T.StructField(source, src_field.dataType, True),
            T.StructField("_b", T.IntegerType(), False),
            T.StructField("_below", T.LongType(), False),
        ]
    )
    lookup = F.broadcast(tiny_df(spark, lookup_rows, lookup_schema))
    budget_col = F.lit(default_budget)
    for s, tokens in sorted(budgets.items()):
        budget_col = F.when(F.col(source) == s, F.lit(tokens)).otherwise(
            budget_col
        )
    order_cols = ["_h", key] + ([tiebreak] if tiebreak else [])
    w = (
        Window.partitionBy(source, "_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tb_cols = [F.col(tiebreak)] if tiebreak else []
    tagged = df.select(
        F.col(source),
        F.col(key),
        tok.alias("n_tok"),
        bucket.alias("_b"),
        h.alias("_h"),
        *tb_cols,
    )
    joined = tagged.join(
        lookup,
        tagged[source].eqNullSafe(lookup[source]) & (tagged["_b"] == lookup["_b"]),
    ).select(
        tagged[source], tagged[key], "n_tok", tagged["_b"], "_h", "_below",
        *([tagged[tiebreak]] if tiebreak else []),
    )
    cum_before = F.col("_below") + F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return (
        joined.select(
            source,
            key,
            "n_tok",
            cum_before.cast("long").alias("cum_before"),
            # the tiebreak identifies WHICH duplicate-key row was
            # selected, so it must surface in the output
            *([tiebreak] if tiebreak else []),
        )
        .where(F.col("cum_before") < budget_col)
    )


def temperature_mixture(
    df: DataFrame,
    target_total: int,
    tau: float = 0.5,
    source: str = "source",
    key: str = "doc_id",
    exact: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-pretraining
    recipe: sample source ``s`` with probability ∝ ``p_s^τ`` where
    ``p_s`` is its natural share — τ<1 upweights small sources, τ=1 is
    natural sampling): deterministically select ``floor(target_total ·
    q_s)`` documents per source (capped at the source's size), picked
    as the md5-order prefix so re-runs and any partitioning choose the
    identical subset.

    Per-source/bucket counts are one tiny aggregate collected to the
    driver (#sources × 4096 rows — model parameters, not data); the
    take counts use ``floor`` (not ``round``) so the DuckDB oracle's
    half-rounding convention can't diverge.

    Exact selection without the largest-source ceiling (r6 VERDICT #5):
    the md5 order statistic is located with a PREFIX-BUCKET histogram
    instead of ranking whole sources. Each row's first 12 md5 bits name
    one of 4096 buckets; one aggregate pass counts (source, bucket)
    cells, and the driver finds per source the boundary bucket that
    contains its ``takes[s]``-th element. Everything BELOW the boundary
    is kept by a pure filter — no sort, no window, no per-source task —
    and only the boundary-bucket sliver (~1/4096 of each source) is
    ranked, in one tiny window. The earlier shape ranked EVERY row with
    ``row_number`` partitioned by source, so the largest source ran in
    one task; now the heavy path is a scan + filter and the plan holds
    at any source size. Output is row-for-row identical (both select
    the md5-order prefix; bucket order is md5-prefix order).

    ``tiebreak`` (optional): a stable column appended last in the md5
    selection order and carried through the output — pass it when keys
    can duplicate or be NULL at the boundary cut, where the straddling
    pick is otherwise run-dependent (r9 VERDICT #6).

    ``exact=False`` remains the cheapest path: rows are kept where
    their xxhash64 falls below the source's take fraction — a
    shuffle-free, state-free scan whose per-source counts are
    binomially distributed around the target (±√n) instead of exact —
    for mixtures where the aggregate pass itself is unwanted.
    """
    from pyspark.sql import Window

    # NULL sources are excluded (same semantics as budget_mixture, where
    # a NULL never matches any budget) — and would otherwise break the
    # sorted() driver math
    if tiebreak and tiebreak in (key, source):
        raise ValueError(
            f"tiebreak column {tiebreak!r} must differ from key/source"
        )
    df = df.filter(F.col(source).isNotNull())
    n_buckets = 4096
    h = F.md5(F.col(key).cast("string"))
    # NULL key → bucket 0 (NULL md5 sorts first, so bucket 0 is where
    # the legacy whole-source ranking placed it) — otherwise a NULL
    # ``_b`` fails both the bulk and edge filters and exact targets
    # silently under-fill (r7 ADVICE)
    bucket = F.coalesce(
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int"), F.lit(0)
    )
    cells = (
        df.groupBy(F.col(source).alias("_s"), bucket.alias("_b"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    counts: dict = {}
    per_bucket: dict = {}
    for r in cells:
        counts[r["_s"]] = counts.get(r["_s"], 0) + r["n"]
        per_bucket[(r["_s"], r["_b"])] = r["n"]
    if not counts:
        # empty in, empty out (schema matches the populated branches)
        return df.select(key, source, *([tiebreak] if tiebreak else []))
    total = sum(counts.values())
    weights = {s: (n / total) ** tau for s, n in sorted(counts.items())}
    wsum = sum(weights[s] for s in sorted(weights))
    takes = {
        s: min(int(target_total * (weights[s] / wsum)), counts[s])
        for s in sorted(counts)
    }
    if not exact:
        # shuffle-free scale path: keep a row iff the top 52 bits of
        # xxhash64(key, source) fall below the source's take fraction —
        # expected per-source counts hit the target with binomial noise,
        # no window, no sort, no state
        frac = F.lit(0.0)
        for s, n in sorted(takes.items()):
            frac = F.when(
                F.col(source) == s, F.lit(n / max(counts[s], 1))
            ).otherwise(frac)
        u = (F.abs(F.xxhash64(F.col(key), F.col(source))) % F.lit(1 << 52)) / F.lit(
            float(1 << 52)
        )
        return df.select(key, source).where(u < frac)
    # driver threshold merge: per source, walk the bucket histogram to
    # the boundary bucket holding the takes[s]-th element
    boundary: dict = {}  # source -> (boundary_bucket, remainder_in_it)
    for s in sorted(takes):
        need = takes[s]
        b = 0
        while need > 0 and b < n_buckets:
            in_b = per_bucket.get((s, b), 0)
            if in_b >= need:
                break
            need -= in_b
            b += 1
        boundary[s] = (b if need > 0 else -1, need)
    below = F.lit(-1)
    edge = F.lit(-1)
    rem = F.lit(0)
    for s in sorted(boundary):
        b, r = boundary[s]
        below = F.when(F.col(source) == s, F.lit(b)).otherwise(below)
        edge = F.when(
            F.col(source) == s, F.lit(b if r > 0 else -1)
        ).otherwise(edge)
        rem = F.when(F.col(source) == s, F.lit(r)).otherwise(rem)
    tb = [tiebreak] if tiebreak else []
    tb_cols = [F.col(tiebreak)] if tiebreak else []
    tagged = df.select(F.col(key), F.col(source), bucket.alias("_b"), *tb_cols)
    bulk = tagged.where(F.col("_b") < below).select(key, source, *tb)
    # optional stable tiebreak appended LAST: duplicate/NULL keys at the
    # boundary-bucket cut otherwise tie completely and the straddler is
    # run-dependent (r9 VERDICT #6); it also rides the output so the
    # picked row is identifiable
    w = Window.partitionBy(source).orderBy(h, key, *tb_cols)
    sliver = (
        tagged.where(F.col("_b") == edge)
        .select(
            F.col(key), F.col(source), *tb_cols,
            F.row_number().over(w).alias("_rn"),
        )
        .where(F.col("_rn") <= rem)
        .select(key, source, *tb)
    )
    return bulk.unionAll(sliver)


# ---------------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
# Models" appendix A — the publicly documented heuristic filter suite)


def gopher_metrics(
    text: Column,
    stopwords: Sequence[str] = ("the", "a", "of", "to", "and", "in"),
) -> dict[str, Column]:
    """Per-document quality metrics behind the Gopher rules: word count,
    mean word length, duplicate-trigram ratio, and stopword hit count.

    Entirely JVM-side HOFs over one ``split`` — row-local, zero shuffle,
    pipelines inside the parquet scan at any scale (same posture as
    :func:`dup_ngram_ratio`, which supplies the repetition metric).
    """
    toks = F.split(F.lower(text), " ")
    n = F.size(toks)
    mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            toks, F.lit(0.0), lambda acc, x: acc + F.length(x)
        )
        / n
    )
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    return {
        "n_words": n.cast("long"),
        "mean_word_len": mean_len,
        "dup3_ratio": dup_ngram_ratio(text, 3),
        "n_stop_hits": n_stop.cast("long"),
    }


def gopher_pass(
    m: Mapping[str, Column],
    min_words: int = 15,
    max_words: int = 10_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 10.0,
    max_dup3: float = 0.25,
    min_stop_hits: int = 2,
) -> Column:
    """The Gopher keep/drop decision over :func:`gopher_metrics` output
    (bounds are the paper's, rescaled to the fixture's 10-99-word docs)."""
    return (
        m["n_words"].between(min_words, max_words)
        & (m["mean_word_len"] >= min_mean_len)
        & (m["mean_word_len"] <= max_mean_len)
        & (m["dup3_ratio"] <= max_dup3)
        & (m["n_stop_hits"] >= min_stop_hits)
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic per-epoch global permutation for training-data
    ordering: position = 1-based rank of ``md5(epoch || id)``. Every
    epoch yields a different but fully reproducible order; re-runs (and
    stragglers re-computing a lost partition) see the identical
    permutation, unlike ``orderBy(rand(seed))`` whose output depends on
    partitioning.

    Scale: a global ``row_number()`` window would funnel the whole
    corpus through ONE task (Spark's no-partition Window). Instead this
    is a distributed global-rank with DETERMINISTIC hash-prefix
    binning: the md5 key is uniform, so fixed equal-width bins on its
    32-bit prefix are balanced without any boundary sampling. Pass 1
    computes per-bin counts (map-side partial agg, one tiny shuffle →
    driver sees ``n_bins`` rows); pass 2 ranks within each bin with a
    PARTITIONED window (``n_bins`` partitions — never the
    single-partition funnel) and adds the bin's broadcast cumulative
    offset. Bin order equals key order (the bin is a key prefix), so
    ``offset + row_number`` is the exact global rank.

    Both passes are pure functions of the row values — unlike
    ``repartitionByRange``, whose sampled boundaries can differ between
    the two jobs (the sketch seed includes the RDD id), so NOTHING is
    persisted and there is no cache to leak or unpersist (r3 ADVICE:
    the old implementation leaked its pinned-partitioning cache through
    a monkey-patched handle). A bin that somehow misses the broadcast
    offset map raises USER_RAISED_EXCEPTION from inside the position
    expression itself (an unreferenced assert column would be pruned by
    Catalyst) instead of silently mis-ranking.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("|", F.lit(str(epoch)), F.col(id_col).cast("string")))
    n_parts = int(
        num_partitions
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    n_bins = max(n_parts * 8, 256)
    # first 8 hex chars as a long (exact: < 2^32); bin = v*n_bins >> 32
    # keeps every product below 2^52 — no overflow, no float rounding
    v32 = F.conv(F.substring("shuffle_key", 1, 8), 16, 10).cast("long")
    keyed = df.select(F.col(id_col), h.alias("shuffle_key")).withColumn(
        "_bin", F.shiftright(v32 * n_bins, 32).cast("int")
    )
    counts = {
        r["_bin"]: r["n"]
        for r in keyed.groupBy("_bin").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = tiny_df(
        keyed.sparkSession, offsets or [(0, 0)], "_bin int, _off long"
    )
    off_or_fail = F.when(F.col("_off").isNotNull(), F.col("_off")).otherwise(
        F.raise_error(
            F.lit("epoch_shuffle: bin missing from offset map")
        ).cast("long")
    )
    w = Window.partitionBy("_bin").orderBy(
        F.col("shuffle_key").asc(), F.col(id_col).asc()
    )
    return keyed.join(F.broadcast(off_df), "_bin", "left").select(
        id_col,
        "shuffle_key",
        (F.row_number().over(w) + off_or_fail).cast("long").alias("position"),
    )


def length_batches(
    df: DataFrame,
    token_count: Column,
    batch_size: int = 8,
    bucket_width: int = 25,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-bucketed batch assembly (padding-waste minimization): docs
    are grouped into fixed-width token-length buckets, ordered
    deterministically within each bucket, and cut into ``batch_size``
    batches; per batch, report the padded cost (``batch max × size``)
    against real tokens.

    Shuffle profile: one hash shuffle on the bucket id + a per-bucket
    sort — each bucket is an independent, bounded sort (same posture as
    pack_sequences' per-shard windows); there is never a global order.
    The returned ``padding_frac`` is the training-efficiency metric this
    operator exists to minimize: batching random docs at the corpus's
    length spread wastes ~30-50% of compute on pad tokens, bucketing
    cuts it to ``< bucket_width / mean_len``.
    """
    from pyspark.sql import Window

    n_tok = token_count.cast("long")
    bucket = F.floor(n_tok / bucket_width).cast("long")
    w = Window.partitionBy(bucket).orderBy(F.col(id_col).asc())
    rows = df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        bucket.alias("bucket"),
        F.floor((F.row_number().over(w) - 1) / batch_size)
        .cast("long")
        .alias("batch_id"),
    )
    return (
        rows.groupBy("bucket", "batch_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("n_tok").alias("max_len"),
            F.sum("n_tok").alias("sum_tokens"),
        )
        .withColumn(
            "padding_frac",
            F.when(F.col("max_len") > 0, (
                F.col("max_len") * F.col("n_docs") - F.col("sum_tokens"))
                / (F.col("max_len") * F.col("n_docs"))
            ).otherwise(F.lit(0.0)),  # all-empty batch: 0/0 would be NaN
        )
    )


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
    exact_ndv: bool = False,
) -> DataFrame:
    """ANALYZE-style dataset profile: one output row per column with
    ``(column, n_rows, n_nulls, n_distinct, min_str, max_str)``.
    min/max are rendered as strings so heterogeneous column types share
    one output schema.

    Scale: all per-column aggregates compute in a SINGLE two-phase hash
    aggregate pass (one scan, map-side partials). By default ``ndv`` is
    ``approx_count_distinct`` (HLL — one pass, no row expansion); with
    ``exact_ndv=True`` Spark plans multiple COUNT(DISTINCT) via Expand,
    which replicates every row ``len(cols)`` times before the shuffle —
    fine for an oracle check, wrong as the default at 100 TB. The
    unpivot to row-per-column happens on the single aggregated row.
    """
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("__n")]
    for i, c in enumerate(cols):
        ndv = (
            F.countDistinct(F.col(c))
            if exact_ndv
            else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(F.col(c)).alias(f"__c{i}_cnt"),
            ndv.alias(f"__c{i}_ndv"),
            # min/max in the column's NATIVE ordering, cast after — a
            # pre-cast would make numeric columns compare lexicographically
            F.min(F.col(c)).cast("string").alias(f"__c{i}_min"),
            F.max(F.col(c)).cast("string").alias(f"__c{i}_max"),
        ]
    one = df.agg(*aggs)
    # positional internal aliases + escaped label literals: profiled column
    # names may be reserved words or contain quotes/dots/spaces — they must
    # never reach selectExpr as identifiers
    stack = ", ".join(
        "'{label}', __c{i}_cnt, __c{i}_ndv, __c{i}_min, __c{i}_max".format(
            label=c.replace("'", "''"), i=i
        )
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack}) AS "
        "(column, __cnt, n_distinct, min_str, max_str)",
    ).select(
        "column",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("__cnt")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str",
        "max_str",
    )


def c4_line_filter(
    text: Column,
    min_words: int = 5,
    blocklist: Sequence[str] = ("lorem", "javascript", "cookie"),
) -> dict[str, Column]:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the public
    heuristics): split the document on newlines, keep only lines with at
    least ``min_words`` words and no blocklisted word, and re-join.
    Returns ``{"n_lines", "n_kept", "cleaned"}``.

    Blocklist matching is case-INsensitive (the C4 heuristics are; r3
    ADVICE — 'JavaScript' must not slip past a 'javascript' entry) but
    exact-token: a line token must equal a blocklist word after
    lowercasing, so punctuation-adjacent forms like ``cookies.`` pass.
    Callers wanting substring semantics should pre-normalize the text.
    Kept lines keep their original case.

    Row-local JVM HOFs over one split — zero shuffle, pipelines inside
    the scan at any scale (the same posture as gopher_metrics; this is
    the line-granular member of the cleaning family, vs the document-
    granular Gopher rules and the token-granular stopword strip).
    """
    lines = F.split(text, "\n")
    block = F.array(*[F.lit(w.lower()) for w in blocklist])
    keep = F.filter(
        lines,
        lambda l: (F.size(F.split(l, " ")) >= min_words)
        & ~F.exists(
            F.split(F.lower(l), " "), lambda w: F.array_contains(block, w)
        ),
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": F.size(keep).cast("long"),
        "cleaned": F.array_join(keep, "\n"),
    }


def hashed_linear_score(
    df: DataFrame,
    weights_milli: list[int] | None = None,
    n_buckets: int = 4096,
    threshold_milli: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """fastText-style hashed linear quality-classifier INFERENCE — the
    model-based document filter of the DCLM / FineWeb-Edu recipe family
    (a linear model over hashed bag-of-words features), as a pure
    zero-shuffle Catalyst projection.

    Per doc: ``tokens = split(lower(text), ' ')``; each token hashes to
    a bucket ``conv(substr(md5(token), 1, 8), 16, 10) % n_buckets`` (an
    engine-portable 32-bit hash — DuckDB reproduces it with
    ``('0x' || substr(md5(tk),1,8))::UBIGINT``); the doc's score is the
    SUM of per-bucket INTEGER milli-weights, and
    ``keep = score_milli > threshold_milli · n_tokens`` (the mean-score
    threshold cross-multiplied into exact integer space — no float
    anywhere, so engine compares can never disagree at a boundary).

    ``weights_milli`` is the trained parameter vector (length
    ``n_buckets``, thousandths) — the bounded model-parameter pattern:
    it rides the plan as one array literal on a broadcast one-row
    frame, never a per-token join. ``None`` selects the deterministic
    pseudo-model ``((b·2654435761 + 12345) % 2001) − 1000`` computed
    inline (what the declared-query oracle replicates).

    Output: ``(id, n_tokens, score_milli, keep)`` with ``keep`` as
    BIGINT 0/1 (the engine's boolean-rendering convention);
    ``keep_cols`` appends pass-through input columns so scorers compose
    into one projection without a join (x_curation_pipeline).

    Scale: one narrow map over the corpus — the md5/bucket/weight work
    is per-token JVM-side inside whole-stage codegen; nothing shuffles,
    nothing is collected. Exactly the posture a 100 TB model-filter
    sweep needs (the model is KBs; the corpus never moves)."""
    # r16: the token array is projected to an ATTRIBUTE first — the
    # single-projection form evaluated the split twice per row (once
    # for n_tokens, once as the aggregate's input; HOFs are
    # CodegenFallback with no common-subexpression elimination). Two
    # consumers of the alias keep CollapseProject from inlining it, so
    # the split runs once. Rows are bit-identical (same expressions,
    # same order, over the attribute).
    tokens = F.col("_hls_toks")
    n_tok = F.size(tokens).cast("long")

    def bucket(tk):
        return _feature_bucket(tk, n_buckets, hash_fn)

    if weights_milli is None:
        def w(tk):
            return (bucket(tk) * F.lit(2654435761) + 12345) % 2001 - 1000

        scored = df.withColumn(
            "_hls_toks", F.split(F.lower(F.col(text_col)), " ")
        ).select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            F.aggregate(
                tokens, F.lit(0).cast("long"), lambda acc, tk: acc + w(tk)
            ).alias("score_milli"),
            *[F.col(c) for c in keep_cols],
        )
    else:
        if len(weights_milli) != n_buckets:
            raise ValueError(
                f"weights_milli length {len(weights_milli)} != n_buckets "
                f"{n_buckets}"
            )
        warr = F.array(*[F.lit(int(v)).cast("long") for v in weights_milli])
        model = df.sparkSession.range(1).select(warr.alias("_w"))
        scored = (
            df.join(F.broadcast(model))
            .withColumn("_hls_toks", F.split(F.lower(F.col(text_col)), " "))
            .select(
                F.col(id_col),
                n_tok.alias("n_tokens"),
                F.aggregate(
                    tokens,
                    F.lit(0).cast("long"),
                    lambda acc, tk: acc
                    + F.element_at(F.col("_w"), (bucket(tk) + 1).cast("int")),
                ).alias("score_milli"),
                *[F.col(c) for c in keep_cols],
            )
        )
    return scored.withColumn(
        "keep",
        (
            F.col("score_milli") > F.lit(threshold_milli) * F.col("n_tokens")
        ).cast("long"),
    )


def train_hashed_linear(
    labeled: DataFrame,
    n_buckets: int = 4096,
    n_iters: int = 25,
    learning_rate: float = 2.0,
    label_col: str = "label",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> list[int]:
    """Train the milli-weight vector :func:`hashed_linear_score`
    consumes — batch-gradient-descent logistic regression over the SAME
    hashed bag-of-words features inference uses (md5-prefix bucket %
    ``n_buckets``), expressed entirely in DataFrame ops (no MLlib
    vector UDTs, no Python UDFs): the train/serve feature map cannot
    diverge because it is literally the same expression.

    Per iteration (the train_bpe pattern — iterate on a BOUNDED model,
    never collect the corpus):

    1. margins: one shuffle-free projection scores every doc with the
       current weights (aggregate HOF + array-literal model, exactly
       the inference plan), mean-of-bucket-indicator features;
    2. residuals: ``sigmoid(margin) − label``, still row-local;
    3. gradient: explode bucket occurrences → ONE bounded-key shuffle
       (``n_buckets`` distinct keys, map-side partial agg) →
       ``n_buckets`` scalars collected to the driver;
    4. driver updates the weight vector (KBs) and rebuilds the literal.

    The featurized frame is computed once and persisted; the collect is
    O(n_buckets) per iteration regardless of corpus size. Returns
    integer milli-weights (coefficients × 1000, rounded).

    ``labeled`` needs a 0/1 ``label`` column (quality annotations, or a
    seed heuristic à la DCLM's fastText stage)."""
    from pyspark import StorageLevel

    tokens = F.split(F.lower(F.col(text_col)), " ")
    feats = labeled.select(
        F.col(label_col).cast("double").alias("_y"),
        F.transform(
            tokens,
            lambda tk: _feature_bucket(tk, n_buckets, hash_fn).cast("int"),
        ).alias("_b"),
    ).filter(F.size("_b") > 0).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_docs = feats.count()  # also materializes the persist
        if n_docs == 0:
            return [0] * n_buckets
        w = [0.0] * n_buckets
        for _ in range(n_iters):
            warr = F.array(*[F.lit(v) for v in w])
            margin = F.aggregate(
                F.col("_b"),
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(warr, b + 1),
            ) / F.size("_b")
            resid = (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)) - F.col("_y")
            ).alias("_r")
            grad_rows = (
                feats.select(resid, "_b")
                .select(
                    "_r",
                    F.size("_b").alias("_n"),
                    F.explode("_b").alias("bucket"),
                )
                .groupBy("bucket")
                .agg(F.sum(F.col("_r") / F.col("_n")).alias("g"))
                .collect()
            )
            # mean gradient over the corpus: the agg produced per-bucket
            # SUMS of (sigmoid(m)-y)/n_tokens
            step = learning_rate / n_docs
            for row in grad_rows:
                w[row["bucket"]] -= step * row["g"]
        return [int(round(v * 1000)) for v in w]
    finally:
        feats.unpersist()


def fit_bigram_lm(corpus: DataFrame, text_col: str = "text"):
    """Fit the Stupid-Backoff model :func:`bigram_logprob` consumes on
    a (clean reference) corpus: returns ``(uni, bi)`` count frames —
    ``uni(_uw, _cu)`` and ``bi(_bp, _bw, _cb)``. Persist them between
    runs and pass as ``lm=`` to score any number of corpora against the
    same reference (the CCNet production shape). Both collapse to one
    row per distinct gram before anything is stored."""
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    pairs = corpus.select(
        F.posexplode(toks).alias("_pos", "_w"), toks.alias("_toks")
    ).select(
        "_w",
        F.when(
            F.col("_pos") > 0, F.element_at(F.col("_toks"), F.col("_pos"))
        ).alias("_prev"),
    )
    uni = pairs.groupBy(F.col("_w").alias("_uw")).agg(
        F.count("*").alias("_cu")
    )
    bi = (
        pairs.filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("_bp"), F.col("_w").alias("_bw"))
        .agg(F.count("*").alias("_cb"))
    )
    return uni, bi


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    backoff: float = 0.4,
    broadcast_vocab: bool = True,
    lm: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document BIGRAM language-model cross-entropy in bits/token
    under Stupid Backoff (Brants et al. 2007 — the web-scale scoring
    rule: no discounting to tune, counts only):
    ``S(w|prev) = c(prev,w)/c(prev)`` when the bigram was seen, else
    ``backoff · c(w)/N``; a document's first token scores its unigram
    probability. Sharper fluency signal than :func:`unigram_logprob`
    (word ORDER now matters), same output shape
    ``(id, n_tokens, bits_per_token)``.

    The LM is fit on ``docs`` itself by default (corpus self-scoring,
    the CCNet bucket regime); pass ``lm=fit_bigram_lm(clean_corpus)``
    to score against a REFERENCE model instead — out-of-vocabulary
    tokens then take the unigram floor ``1/(N+1)`` (the
    :func:`unigram_logprob` OOV rule: an all-unseen gibberish document
    must rank at the top, not vanish). Scale: both count tables collapse to one row per
    DISTINCT unigram/bigram before anything joins (bounded by
    vocabulary², in practice Heaps-law sublinear); the probes are
    token-keyed postings joins, broadcast when they fit
    (``broadcast_vocab``), and the per-doc average partial-aggregates
    map-side so the doc-keyed Exchange carries ~one row per doc. No
    driver collect anywhere — unlike the hashed classifiers, the model
    here STAYS distributed because the vocabulary is corpus-sized, not
    bucket-bounded.
    """
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    pairs = docs.select(
        F.col(id_col),
        F.posexplode(toks).alias("_pos", "_w"),
        F.size(toks).alias("_n"),
        toks.alias("_toks"),
    ).select(
        id_col,
        "_pos",
        "_w",
        # prev token (null for the document's first token)
        F.when(
            F.col("_pos") > 0, F.element_at(F.col("_toks"), F.col("_pos"))
        ).alias("_prev"),
    )
    # r16: the pairs postings feed THREE consumers (unigram counts,
    # bigram counts, the probe side) — unbarriered, each re-scans and
    # re-explodes the corpus. The REBALANCE barrier materializes the
    # narrow (id, pos, w, prev) rows once so all consumers read shuffle
    # files: one corpus scan instead of three (guide §8 — at 100 TB the
    # three source scans dominate; measured locally wall 5.4 → 4.5 s,
    # CPU 7.7 → 9.1 — the exchange costs a bit of local CPU and is
    # taken for the scan-count reduction).
    pairs = pairs.hint("rebalance")
    if lm is None:
        uni = pairs.groupBy(F.col("_w").alias("_uw")).agg(
            F.count("*").alias("_cu")
        )
        bi = (
            pairs.filter(F.col("_prev").isNotNull())
            .groupBy(F.col("_prev").alias("_bp"), F.col("_w").alias("_bw"))
            .agg(F.count("*").alias("_cb"))
        )
    else:
        uni, bi = lm
    n_total = uni.agg(F.sum("_cu").alias("_nt"))
    ctx = bi.groupBy(F.col("_bp").alias("_cp")).agg(
        F.sum("_cb").alias("_cc")
    )
    maybe_b = F.broadcast if broadcast_vocab else (lambda d: d)
    scored = (
        pairs.join(maybe_b(uni), pairs["_w"] == uni["_uw"], "left")
        .join(
            maybe_b(bi),
            (pairs["_prev"] == bi["_bp"]) & (pairs["_w"] == bi["_bw"]),
            "left",
        )
        .join(maybe_b(ctx), pairs["_prev"] == ctx["_cp"], "left")
        .crossJoin(F.broadcast(n_total))
    )
    # context count c(prev) from the bigram table equals c(prev)-as-
    # non-final-token; fit-on-self guarantees _cu/_cc present wherever
    # the CASE reaches them. With an external lm, OOV tokens (null _cu)
    # take the unigram floor 1/(N+1) — never dropped, never div-by-null
    floor = F.lit(1.0) / (F.col("_nt").cast("double") + 1.0)
    uni_p = F.when(
        F.col("_cu").isNotNull(),
        F.col("_cu").cast("double") / F.col("_nt").cast("double"),
    ).otherwise(floor)
    p = (
        F.when(F.col("_prev").isNull(), uni_p)
        .when(
            F.col("_cb").isNotNull(),
            F.col("_cb").cast("double") / F.col("_cc").cast("double"),
        )
        .otherwise(F.lit(backoff) * uni_p)
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.avg(-F.log2(p)).alias("bits_per_token"),
    )


def collapse_repeats(
    df: DataFrame,
    delimiter: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document consecutive-repeat collapse — the self-repetition
    cleanup between C4's line rules and the corpus-level dedups: runs of
    identical ``delimiter``-separated segments (a generation-loop
    artifact and a scraper artifact both) collapse to their first
    occurrence, non-adjacent repeats are left alone (they may be
    legitimate structure). Returns ``(id, n_segments, n_collapsed,
    cleaned)``.

    Pure row-local array work — ``filter(t, (x, i) -> i = 0 OR x !=
    t[i])`` — zero shuffle, zero Python: pipelines inside the scan
    stage at any scale (plan-asserted)."""
    import re as _re

    # r16: segments and kept staged as attributes — the single-Column
    # form re-split the text per element inside the filter lambda
    # (element_at over the inline split) and re-ran the whole filter for
    # each of its two consumers; HOFs get no common-subexpression
    # elimination. Rows are bit-identical (same expressions, same order).
    s0 = df.withColumn(
        "_cr_segs", F.split(F.col(text_col), _re.escape(delimiter))
    )
    s1 = s0.withColumn(
        "_cr_kept",
        F.filter(
            F.col("_cr_segs"),
            lambda x, i: (i == 0) | (x != F.element_at(F.col("_cr_segs"), i)),
        ),
    )
    return s1.select(
        F.col(id_col),
        F.size("_cr_segs").cast("long").alias("n_segments"),
        (F.size("_cr_segs") - F.size("_cr_kept"))
        .cast("long")
        .alias("n_collapsed"),
        F.array_join(F.col("_cr_kept"), delimiter).alias("cleaned"),
    )
