"""Raw-HTML → main-text extraction (r9 VERDICT "What's missing" #2):
the FIRST stage of a web-corpus pipeline, before the clean-text ops
(gopher/C4 quality, dedup, DSIR) this repo already provides.

Public jusText/trafilatura-style heuristics, re-expressed as pure
Catalyst column expressions so the stage is a zero-shuffle row-local
projection that fuses into the curation pipeline's single pass
(plan-asserted in tests/test_plans.py):

1. drop non-content ELEMENTS whole (``<script>``, ``<style>``,
   ``<noscript>``, comments);
2. turn block-level tags into block separators (jusText's segmentation:
   content decisions are made per block, not per page);
3. strip every remaining tag, decode the common entities;
4. keep a block iff it looks like prose — ≥ ``min_words`` words AND
   (stopword density ≥ ``min_stop_pct``/100 OR the block is long):
   jusText's core observation that boilerplate (nav, footer, cookie
   banners) is short and nearly stopword-free while real sentences in
   any stopword-covered language are not.

Every pattern sticks to the regex subset Java (Spark) and RE2 (DuckDB)
agree on — inline ``(?is)`` flags, non-greedy spans, NO backreferences
or lookaround — so a DuckDB oracle replays the identical chain
(x_html_extract); the pattern constants below are that oracle's single
source of truth, like quality.py:PII_RULES. The stopword-density rule
is integer cross-multiplied (``100·n_stop ≥ min_stop_pct·n_words``) per
the engine's exact-oracle float discipline.

Whitespace note: words are split on single spaces (the corpus
normalization this repo's token ops already assume). Real-world crawl
HTML is pretty-printed — newlines and tab runs INSIDE paragraphs — so
pass ``normalize_ws=True`` there: source whitespace collapses to
single spaces before block segmentation, and only TAG-derived breaks
separate blocks (see :func:`html_strip_tags`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import EN_STOPWORDS

__all__ = [
    "html_strip_tags",
    "html_extract_text",
    "html_detect_lang",
    "html_extract_multilang",
    "html_block_stats",
]

# elements whose CONTENT is dropped whole (no backreference closers —
# RE2 has none, so each element gets its own literal pattern)
STRIP_ELEMENT_RES = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?is)<noscript[^>]*>.*?</noscript>",
    r"(?s)<!--.*?-->",
)
# block-LEVEL tags become newlines: the block segmentation jusText
# scores on (inline tags like <b>/<a>/<span> vanish without a break)
BLOCK_TAG_RE = (
    r"(?is)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article"
    r"|header|footer|nav|blockquote|pre|form|main|aside)\b[^>]*>"
)
ANY_TAG_RE = r"(?s)<[^>]*>"
# anchor CONTENT, for link-density scoring (capture group 1); anchors
# are inline elements, so a block-tag inside one (malformed HTML)
# severs it and its text simply counts as non-link — conservative
LINK_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
# decode order matters: &amp; LAST so '&amp;lt;' decodes to '&lt;' (the
# author wrote a literal '<'), not '<'
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def html_strip_tags(col: Column | str, normalize_ws: bool = False) -> Column:
    """Markup removed, block structure kept as newlines, entities
    decoded — the raw material the per-block keep rule scores. Pure
    chained ``regexp_replace``/``replace``: row-local, codegen-fused,
    zero shuffle at any scale.

    ``normalize_ws=True`` collapses SOURCE whitespace (``\\s+`` → one
    space) after the element drop but BEFORE block segmentation, so
    only TAG-derived newlines separate blocks — real crawl HTML is
    pretty-printed with newlines inside every paragraph, and without
    normalization those fragment one paragraph into many tiny blocks
    the keep rule then starves. Default False preserves the
    plain-text-ish contract (and the frozen x_html_extract oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in STRIP_ELEMENT_RES:
        c = F.regexp_replace(c, pat, "")
    if normalize_ws:
        c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, BLOCK_TAG_RE, "\n")
    c = F.regexp_replace(c, ANY_TAG_RE, "")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _block_words(b: Column) -> Column:
    return F.filter(F.split(F.trim(b), " "), lambda w: w != F.lit(""))


def _keep_block(
    b: Column,
    stop: Column,
    min_words: int,
    min_stop_pct: int,
    long_block_words: int,
) -> Column:
    words = _block_words(b)
    nw = F.size(words)
    ns = F.size(
        F.filter(words, lambda w: F.array_contains(stop, F.lower(w)))
    )
    return (nw >= F.lit(min_words)) & (
        (ns * F.lit(100) >= nw * F.lit(min_stop_pct))
        | (nw >= F.lit(long_block_words))
    )


def _clean_block(b: Column) -> Column:
    """Per-block tag strip + entity decode (the tail of the default
    chain, applied after segmentation so anchor structure is still
    visible to the link-density rule)."""
    t = F.regexp_replace(b, ANY_TAG_RE, "")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return t


def _link_len(b: Column) -> Column:
    """Characters of ANCHOR text in a still-tagged block, measured on
    the same entity-DECODED text as the link-density denominator
    (``_clean_block``) — ADVICE r10: counting ``&amp;`` as five chars
    in the numerator only inflated link density for entity-heavy
    anchors and could drop prose a consistent measure keeps."""
    parts = F.regexp_extract_all(b, F.lit(LINK_RE), F.lit(1))
    t = F.regexp_replace(F.array_join(parts, ""), ANY_TAG_RE, "")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.length(t)


def html_extract_text(
    col: Column | str,
    min_words: int = 3,
    min_stop_pct: int = 5,
    long_block_words: int = 30,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    normalize_ws: bool = False,
    max_link_pct: int | None = None,
) -> Column:
    """Main content of an HTML document: tag-strip + block segmentation
    + the prose keep-rule, kept blocks trimmed and re-joined with
    newlines. NULL html → NULL (the Catalyst convention). One row-local
    expression — prepend it to any corpus pipeline without adding an
    Exchange.

    ``max_link_pct`` enables jusText's second signature heuristic, LINK
    DENSITY: a block whose anchor text exceeds ``max_link_pct``% of its
    text is navigation no matter how stopword-rich ("Home · About us ·
    Contact the team" beats the density rule but is ~100% links). The
    link-aware path segments BEFORE stripping so anchors are still
    visible per block; with it off (default) the original single-chain
    plan — and the frozen x_html_extract oracle — are untouched."""
    stop = F.array(*[F.lit(s) for s in stopwords])
    if max_link_pct is None:
        blocks = F.split(html_strip_tags(col, normalize_ws), "\n")
        kept = F.filter(
            blocks,
            lambda b: _keep_block(
                b, stop, min_words, min_stop_pct, long_block_words
            ),
        )
        # explicit single-arg lambda: transform would otherwise bind its
        # (element, index) pair onto trim's deprecated two-parameter
        # signature and trim index DIGITS off block edges
        return F.array_join(F.transform(kept, lambda b: F.trim(b)), "\n")
    c = F.col(col) if isinstance(col, str) else col
    for pat in STRIP_ELEMENT_RES:
        c = F.regexp_replace(c, pat, "")
    if normalize_ws:
        c = F.regexp_replace(c, r"\s+", " ")
    raw_blocks = F.split(F.regexp_replace(c, BLOCK_TAG_RE, "\n"), "\n")
    kept = F.filter(
        raw_blocks,
        lambda b: _keep_block(
            _clean_block(b), stop, min_words, min_stop_pct, long_block_words
        )
        & (
            _link_len(b) * F.lit(100)
            <= F.length(F.trim(_clean_block(b))) * F.lit(max_link_pct)
        ),
    )
    return F.array_join(
        F.transform(kept, lambda b: F.trim(_clean_block(b))), "\n"
    )


def html_detect_lang(
    col: Column | str,
    langs: tuple[str, ...] | None = None,
    normalize_ws: bool = False,
) -> Column:
    """Heuristic language of an HTML document: strip the markup, then
    argmax of function-word hits per candidate language over the whole
    page's tokens (the stopword method jusText itself uses to pick its
    list). Ties resolve to the EARLIER entry in ``langs`` (first-max of
    ``array_position``), zero-hit pages to ``langs[0]`` — both
    deterministic and oracle-replicable. Pure row-local expression."""
    from .stopwords import DEFAULT_LANGS, STOPWORDS

    langs = langs or DEFAULT_LANGS
    stripped = html_strip_tags(col, normalize_ws)
    return _detect_from_text(stripped, langs, STOPWORDS)[0]


def _detect_from_text(stripped: Column, langs, stopwords):
    """(lang, stop_array) for already-stripped text: hits of each
    language's list over the page tokens, first-max argmax, and the
    winning list selected via ``element_at`` over an array-of-arrays —
    no per-language expression branching."""
    words = _block_words(F.replace(stripped, F.lit("\n"), F.lit(" ")))
    stop_arrays = [
        F.array(*[F.lit(s) for s in stopwords[lang]]) for lang in langs
    ]
    scores = F.array(
        *[
            F.size(F.filter(words, lambda w: F.array_contains(sa, F.lower(w))))
            for sa in stop_arrays
        ]
    )
    idx = F.array_position(scores, F.array_max(scores)).cast("int")
    # explicit NULL guard: element_at treats a NULL index as -1 (last
    # element) in this Spark build, so NULL html would "detect" the
    # final list entry instead of propagating NULL
    lang = F.when(
        idx.isNull(), F.lit(None).cast("string")
    ).otherwise(F.element_at(F.array(*[F.lit(lang) for lang in langs]), idx))
    stop = F.element_at(F.array(*stop_arrays), F.coalesce(idx, F.lit(1)))
    return lang, stop


def html_extract_multilang(
    col: Column | str,
    langs: tuple[str, ...] | None = None,
    min_words: int = 3,
    min_stop_pct: int = 5,
    long_block_words: int = 30,
    normalize_ws: bool = False,
) -> Column:
    """Main-content extraction for MULTILINGUAL crawl data (r10 VERDICT
    #4): detect the page language by stopword-hit argmax
    (:func:`html_detect_lang`), then run the jusText keep rule with
    THAT language's function-word list — so a German or Polish
    paragraph is kept because it is stopword-dense in German or Polish,
    not because it tripped the long-block escape (which also keeps long
    navigation). Returns ``struct(lang, content)``; NULL html → NULL
    fields. Still one row-local Catalyst expression — zero shuffle, the
    language never leaves the row."""
    from .stopwords import DEFAULT_LANGS, STOPWORDS

    langs = langs or DEFAULT_LANGS
    stripped = html_strip_tags(col, normalize_ws)
    lang, stop = _detect_from_text(stripped, langs, STOPWORDS)
    kept = F.filter(
        F.split(stripped, "\n"),
        lambda b: _keep_block(
            b, stop, min_words, min_stop_pct, long_block_words
        ),
    )
    content = F.array_join(F.transform(kept, lambda b: F.trim(b)), "\n")
    return F.struct(lang.alias("lang"), content.alias("content"))


def with_html_extract_multilang(
    df,
    col: Column | str,
    out_lang: str = "lang",
    out_content: str = "content",
    langs: tuple[str, ...] | None = None,
    min_words: int = 3,
    min_stop_pct: int = 5,
    long_block_words: int = 30,
    normalize_ws: bool = False,
):
    """``df`` plus ``out_lang``/``out_content`` =
    :func:`html_extract_multilang` of ``col`` — the DataFrame form that
    evaluates each heavy subexpression ONCE per row.

    Why (r16, the with_dup_ngram_ratio finding): higher-order functions
    are CodegenFallback — interpreted, no common-subexpression
    elimination — and the Column form's ``stop`` list is the WHOLE
    detect tree (strip → tokenize → six filter scores → argmax →
    element_at), referenced inside the keep rule's per-word
    ``array_contains`` lambda: every word of every block re-ran the
    full strip+detect pipeline (measured 17.3 CPU-s for 150 rows at
    sf0.1 → ~0.9 after staging). Staging projects stripped text, page
    words, scores, argmax index, the winning stop list and the language
    as attributes — each referenced more than once downstream, so
    CollapseProject keeps the chain. Output values are bit-identical
    (same expressions, same order, over attribute references).
    """
    from .stopwords import DEFAULT_LANGS, STOPWORDS

    langs = langs or DEFAULT_LANGS
    stop_arrays = [
        F.array(*[F.lit(s) for s in STOPWORDS[lang]]) for lang in langs
    ]
    s0 = df.withColumn("_hx_stripped", html_strip_tags(col, normalize_ws))
    s1 = s0.withColumn(
        "_hx_words",
        _block_words(
            F.replace(F.col("_hx_stripped"), F.lit("\n"), F.lit(" "))
        ),
    )
    s2 = s1.withColumn(
        "_hx_scores",
        F.array(
            *[
                F.size(
                    F.filter(
                        F.col("_hx_words"),
                        lambda w: F.array_contains(sa, F.lower(w)),
                    )
                )
                for sa in stop_arrays
            ]
        ),
    ).drop("_hx_words")
    s3 = s2.withColumn(
        "_hx_idx",
        F.array_position(
            F.col("_hx_scores"), F.array_max(F.col("_hx_scores"))
        ).cast("int"),
    ).drop("_hx_scores")
    idx = F.col("_hx_idx")
    s4 = s3.withColumn(
        "_hx_stop",
        F.element_at(F.array(*stop_arrays), F.coalesce(idx, F.lit(1))),
    ).withColumn(
        out_lang,
        F.when(idx.isNull(), F.lit(None).cast("string")).otherwise(
            F.element_at(F.array(*[F.lit(lang) for lang in langs]), idx)
        ),
    ).drop("_hx_idx")
    kept = F.filter(
        F.split(F.col("_hx_stripped"), "\n"),
        lambda b: _keep_block(
            b, F.col("_hx_stop"), min_words, min_stop_pct, long_block_words
        ),
    )
    content = F.array_join(F.transform(kept, lambda b: F.trim(b)), "\n")
    # NULL html -> NULL fields (the Column form's contract): stripped is
    # NULL, so kept/content and lang are NULL via ordinary propagation
    return s4.withColumn(out_content, content).drop(
        "_hx_stripped", "_hx_stop"
    )


def html_block_stats(
    col: Column | str,
    min_words: int = 3,
    min_stop_pct: int = 5,
    long_block_words: int = 30,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    normalize_ws: bool = False,
) -> Column:
    """Per-document extraction diagnostics as a struct
    ``(n_blocks, n_kept, n_chars_kept)`` — the QA signal a crawl
    pipeline monitors (how much of each page survives) without
    materializing the text twice."""
    stop = F.array(*[F.lit(s) for s in stopwords])
    blocks = F.filter(
        F.split(html_strip_tags(col, normalize_ws), "\n"),
        lambda b: F.size(_block_words(b)) > 0,
    )
    kept = F.filter(
        blocks,
        lambda b: _keep_block(
            b, stop, min_words, min_stop_pct, long_block_words
        ),
    )
    return F.struct(
        F.size(blocks).cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        F.aggregate(
            F.transform(kept, lambda b: F.length(F.trim(b)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars_kept"),
    )
