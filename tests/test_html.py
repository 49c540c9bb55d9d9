"""HTML main-text extraction (functions/html.py): strip/segment/decode
known answers, the jusText-style keep rule, NULL passthrough, and the
zero-shuffle composition with the downstream curation ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from blockchaintoavro_spark.functions.html import (
    html_block_stats,
    html_extract_text,
    html_strip_tags,
)


def _one(spark, html, expr):
    return (
        spark.createDataFrame([(html,)], "h string")
        .select(expr.alias("v"))
        .first()["v"]
    )


def test_strip_tags_known_answers(spark):
    e = lambda h: _one(spark, h, html_strip_tags("h"))
    # script/style/noscript/comments drop WITH their content, even with
    # '<' inside and mixed case; block tags become newlines; inline
    # tags vanish without a break
    assert e(
        "<SCRIPT>if (1 < 2) { x(); }</script><p>a</p>"
        "<style>p>b {}</style><!-- <p>no</p> -->"
    ) == "\na\n"
    assert e("x<b>y</b>z<span>w</span>") == "xyzw"
    assert e("a<br/>b<DIV class='c'>d</div>e") == "a\nb\nd\ne"
    # entity decode order: &amp;lt; is an AUTHORED '&lt;', not a tag
    assert e("&amp;lt;kept&amp;gt; &lt;b&gt; &quot;q&quot; &#39;s&#39; &nbsp;!") == (
        "&lt;kept&gt; <b> \"q\" 's'   !"
        .replace("  !", " !")
    )
    assert e(None) is None


def test_extract_keep_rule(spark):
    prose = "this is the kind of sentence a real page contains for it"
    longb = " ".join(f"w{i}" for i in range(30))  # 30 words, 0 stopwords
    html = (
        "<nav>Home About Contact Login</nav>"
        f"<p>{prose}</p>"
        "<div>Buy now limited offer</div>"
        f"<p>{longb}</p>"
        "<footer>Copyright 2024 Example Corp All rights reserved</footer>"
    )
    got = _one(spark, html, html_extract_text("h"))
    # nav/ad/footer (short, stopword-free) drop; prose keeps via
    # stopword density; the long block keeps via the length escape
    assert got == f"{prose}\n{longb}"
    s = _one(spark, html, html_block_stats("h"))
    assert (s["n_blocks"], s["n_kept"]) == (5, 2)
    assert s["n_chars_kept"] == len(prose) + len(longb)
    assert _one(spark, None, html_extract_text("h")) is None
    # empty page: no blocks survive → empty string, zero stats
    s0 = _one(spark, "<p> </p>", html_block_stats("h"))
    assert (s0["n_blocks"], s0["n_kept"], s0["n_chars_kept"]) == (0, 0, 0)
    assert _one(spark, "<p> </p>", html_extract_text("h")) == ""


def test_extract_composes_zero_shuffle_with_curation(spark):
    """The whole point of a pure-Catalyst extractor: prepending it to
    the collapse→classify curation chain must add NO Exchange and NO
    Python evaluation — one whole-stage pass from raw HTML to scores."""
    from blockchaintoavro_spark.operators.quality import (
        collapse_repeats,
        hashed_linear_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><nav>Home About</nav><p>"),
            F.col("text"),
            F.lit("</p><footer>Copyright 2024 Corp</footer></body></html>"),
        ).alias("html"),
    )
    extracted = pages.select(
        "doc_id", html_extract_text("html").alias("text")
    )
    scored = hashed_linear_score(
        collapse_repeats(extracted, delimiter=" "), text_col="cleaned"
    )
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "Exchange hashpartitioning" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, p
    # and it actually runs end to end
    out = scored.limit(5).collect()
    assert len(out) == 5


def test_html_extract_builds_on_streaming_input(spark, tmpdir):
    """Pure-projection extraction runs unchanged on a streaming frame
    (no state, no watermark needed) — the web-pipeline stage-0 shape:
    crawl drop-dir in, clean text out, batch-equals-stream."""
    docs = spark.createDataFrame(
        [
            (1, "<nav>Home About Contact Login</nav><p>this is the kind "
                "of page a crawl actually yields for it</p>"),
            (2, "<style>p{}</style><p>and this one too because it is</p>"
                "<footer>Copyright 2024 Corp</footer>"),
        ],
        "doc_id long, html string",
    )
    src = f"{tmpdir}/html_src"
    docs.write.parquet(src)
    want = {
        (r["doc_id"], r["text"])
        for r in docs.select(
            "doc_id", html_extract_text("html").alias("text")
        ).collect()
    }
    out = f"{tmpdir}/html_out"
    (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .select("doc_id", html_extract_text("html").alias("text"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{tmpdir}/html_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    assert got == want and len(got) == 2
    assert all("Copyright" not in t and "Home" not in t for _, t in got)


def test_normalize_ws_keeps_prettyprinted_paragraphs_whole(spark):
    """Real crawl HTML is pretty-printed: newlines inside a paragraph.
    Without normalization those raw newlines fragment the paragraph
    into tiny blocks the keep rule starves; with normalize_ws=True only
    TAG-derived breaks segment, the paragraph survives whole, and
    tab/newline soup collapses to single spaces."""
    html = (
        "<nav>Home About</nav>\n"
        "<p>\n  this is\n  the kind\tof sentence\n  a real page wraps\n"
        "  across source lines for it\n</p>\n"
        "<footer>Copyright 2024 Corp</footer>"
    )
    frag = _one(spark, html, html_extract_text("h"))
    whole = _one(spark, html, html_extract_text("h", normalize_ws=True))
    # fragmented: no 3-word stopword-bearing line survives intact
    assert "this is the kind of sentence" not in frag
    assert whole == "this is the kind of sentence a real page wraps across source lines for it"
    s = _one(spark, html, html_block_stats("h", normalize_ws=True))
    assert (s["n_blocks"], s["n_kept"]) == (3, 1)


def test_link_density_rule_drops_stopword_rich_nav(spark):
    """jusText's second heuristic: a navigation block can be
    stopword-rich ('About the team', 'Contact us for it') and still be
    ~100% anchor text — max_link_pct drops it; prose with an inline
    link survives; equivalence with the default chain holds when no
    block is link-heavy."""
    prose = (
        'before the <a href="/x">linked words</a> and after them the '
        "sentence keeps going for a while longer"
    )
    nav = (
        '<a href="/">the home of it</a> <a href="/a">about the team</a> '
        '<a href="/c">contact us for it</a>'
    )
    html = f"<div>{nav}</div><p>{prose}</p>"
    # without the rule, the stopword-rich nav sneaks through
    loose = _one(spark, html, html_extract_text("h"))
    assert "about the team" in loose
    strict = _one(spark, html, html_extract_text("h", max_link_pct=50))
    assert "about the team" not in strict
    assert "before the linked words and after them" in strict

    # no-link documents: link-aware path == default chain exactly
    plain = "<nav>Home About</nav><p>this is the kind of page it is</p>"
    assert _one(spark, plain, html_extract_text("h", max_link_pct=50)) == _one(
        spark, plain, html_extract_text("h")
    )
    assert _one(spark, None, html_extract_text("h", max_link_pct=50)) is None


def test_link_density_measures_decoded_anchor_text(spark):
    """ADVICE r10: the link-density NUMERATOR must measure the same
    entity-decoded text as the denominator — an entity-heavy anchor
    previously counted '&amp;' as five characters and could push a
    prose block over max_link_pct that a consistent measure keeps."""
    # decoded: total 48 chars, anchor 20 chars (41% <= 50 -> keep);
    # encoded anchor is 28 chars (58% > 50 -> the old bug dropped it)
    html = (
        "<p>the mix of <a href='/x'>salt &amp; pepper &amp; more</a>"
        " is for it and on it</p>"
    )
    kept = _one(spark, html, html_extract_text("h", max_link_pct=50))
    assert "salt & pepper & more" in kept and kept != ""


def test_multilang_extraction_keeps_nonenglish_prose(spark):
    """r10 VERDICT #4 done-criterion: non-English prose is kept via its
    OWN language's stopword density (each sentence is ~15 words — far
    below the 30-word long-block escape), boilerplate drops in every
    language, and the page language is detected; the EN-only extractor
    drops the same prose (the gap this closes)."""
    from blockchaintoavro_spark.functions.html import (
        html_detect_lang,
        html_extract_multilang,
    )

    prose = {
        "en": "the dog and the cat have a game with the ball and they are glad",
        "de": "der Hund und die Katze haben ein Spiel mit dem Ball und sie sind froh",
        "fr": "le chat et le chien sont dans la maison et ils ont un jeu avec le ballon",
        "es": "el perro y el gato tienen un juego con la pelota y ellos son muy felices",
        "it": "il cane e il gatto hanno un gioco con la palla e loro sono molto felici",
        "pl": "jest nowy dom i ona ma kota i pies jest bardzo wielki i dobry oraz niski",
    }
    page = (
        "<html><body><nav>Portfolio Impressum Kontakt Download</nav>"
        "<h1>Doc 7</h1><p>{}</p>"
        "<footer>Copyright 2024 Example Corp</footer></body></html>"
    )
    for lang, sent in prose.items():
        html = page.format(sent)
        got = _one(spark, html, html_extract_multilang("h"))
        assert got["lang"] == lang, (lang, got)
        assert got["content"] == sent, (lang, got)
        assert _one(spark, html, html_detect_lang("h")) == lang
        if lang != "en":
            # the EN-only rule starves: no EN stopwords, 15 words < 30
            assert _one(spark, html, html_extract_text("h")) == ""

    # NULL passthrough and zero-hit tie-break to langs[0]
    assert _one(spark, None, html_extract_multilang("h"))["lang"] is None
    assert (
        _one(spark, "<p>zzz qqq www</p>", html_extract_multilang("h"))["lang"]
        == "en"
    )


def test_with_html_extract_multilang_matches_column_form(spark):
    """r16: the staged DataFrame form (each heavy subexpression an
    attribute, evaluated once per row) must be bit-identical to the
    Column form on every edge the Column form defines: all six
    languages, boilerplate-only pages, zero-hit tie-break, empty and
    NULL html."""
    from blockchaintoavro_spark.functions.html import (
        html_extract_multilang,
        with_html_extract_multilang,
    )

    pages = [
        "<html><body><nav>Portfolio Impressum Kontakt</nav><p>der Hund "
        "und die Katze haben ein Spiel mit dem Ball und sie sind froh"
        "</p><footer>Copyright 2024</footer></body></html>",
        "<p>le chat et le chien sont dans la maison et ils ont un jeu "
        "avec le ballon</p>",
        "<p>the dog and the cat have a game with the ball and they are "
        "glad</p><nav>Home About Contact</nav>",
        "<p>zzz qqq www</p>",  # zero stopword hits -> langs[0]
        "<nav>Only Nav Here</nav>",  # nothing kept
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "i long, h string"
    )
    res = html_extract_multilang("h")
    old = {
        r["i"]: (r["lang"], r["content"])
        for r in df.select(
            "i", res["lang"].alias("lang"), res["content"].alias("content")
        ).collect()
    }
    new = {
        r["i"]: (r["lang"], r["content"])
        for r in with_html_extract_multilang(df, "h")
        .select("i", "lang", "content")
        .collect()
    }
    assert old == new
