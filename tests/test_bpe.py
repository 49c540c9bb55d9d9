"""BPE tokenizer training (operators/bpe.py) — parity with a pure-Python
Sennrich reference trainer, segmentation determinism, early stop, and
plan shapes (vocab-sized shuffles only; tokenization shuffle-free)."""

import collections

import pytest

from blockchaintoavro_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    char_pair_counts,
    segment_word,
    train_bpe,
    word_counts,
)

CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest",
    "the newest lowest widest low",
]


def _ref_train(corpus, n_merges, min_count=2):
    """Sennrich et al. 2016 learn-BPE on a word-frequency table; ties →
    lexicographically smallest pair (the engine's documented tie-break).
    Reuses segment_word so the merge-application semantics can't drift."""
    wc = collections.Counter(
        w + END_OF_WORD for t in corpus for w in t.lower().split(" ") if w
    )
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, n in wc.items():
            sym = segment_word(w, merges)
            for pair in zip(sym, sym[1:]):
                pc[pair] += n
        if not pc:
            break
        top = max(pc.values())
        if top < min_count:
            break
        merges.append(sorted(p for p, c in pc.items() if c == top)[0])
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_trainer_matches_reference(docs):
    ref = _ref_train(CORPUS, 8)
    got = train_bpe(word_counts(docs), 8)
    assert got == ref
    # the classic corpus learns the classic subwords
    assert ("est", "</w>") in got and ("lo", "w") in got


def test_trainer_early_stops_below_min_count(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert train_bpe(word_counts(df), 10, min_count=2) == []


def test_segment_word_merge_order_and_overlap():
    # merges apply in rank order, all occurrences, left-to-right
    assert segment_word("aaa", [("a", "a")]) == ["aa", "a"]
    assert segment_word("aaaa", [("a", "a"), ("aa", "aa")]) == ["aaaa"]
    assert segment_word("low" + END_OF_WORD, [("l", "o")]) == ["lo", "w", END_OF_WORD]
    # marker is a single symbol, never split into characters
    assert segment_word("x" + END_OF_WORD, []) == ["x", END_OF_WORD]


def test_apply_bpe_tokenizes_with_learned_merges(docs):
    merges = train_bpe(word_counts(docs), 8)
    got = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    exp = [
        t
        for w in CORPUS[2].lower().split(" ")
        if w
        for t in segment_word(w + END_OF_WORD, merges)
    ]
    assert got[2]["bpe_tokens"] == exp
    assert got[2]["n_bpe_tokens"] == len(exp)


def test_char_pair_counts_known_answer(spark):
    df = spark.createDataFrame([(0, "ab ab a")], "doc_id long, text string")
    got = {r["pair"]: r["cnt"] for r in char_pair_counts(df).collect()}
    assert got == {"a|b": 2, "b|</w>": 2, "a|</w>": 1}


def test_bpe_plan_shapes(docs):
    """Pair counting: shuffles only on bounded keys (word, pair) — no
    corpus-sized wide ops. Tokenization: zero shuffle (merges ride the
    closure; row-local mapInPandas)."""
    pc_plan = char_pair_counts(docs)._jdf.queryExecution().executedPlan().toString()
    assert pc_plan.count("Exchange") <= 2, pc_plan
    tok = apply_bpe(docs, [("l", "o")])
    tok_plan = tok._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in tok_plan, tok_plan


def test_apply_bpe_preserves_string_id_column(spark):
    """apply_bpe derives the id field's type from the input schema
    instead of hardcoding long (r5 ADVICE) — a string id column passes
    through uncoerced."""
    docs = spark.createDataFrame(
        [("doc-a", "low lower"), ("doc-b", "low")], "doc_id string, text string"
    )
    tok = apply_bpe(docs, [("l", "o")])
    assert tok.schema["doc_id"].dataType.simpleString() == "string"
    got = {r["doc_id"]: r["bpe_tokens"] for r in tok.collect()}
    assert set(got) == {"doc-a", "doc-b"}
