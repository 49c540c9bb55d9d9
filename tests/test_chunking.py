"""Chunking operator (operators/chunking.py) — window math, provenance,
reconstruction, and plan shape (narrow flat-map, no shuffle)."""

import pytest
from pyspark.sql import functions as F

from blockchaintoavro_spark.operators.chunking import chunk_chars, chunk_tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, ""),  # empty doc → one empty chunk, not zero
        (1, "abcdefghij"),  # shorter than one window
        (2, "x" * 25),  # 25 chars: windows at 0,8,16,24 (stride 8)
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_chars_windows_and_provenance(docs):
    out = {
        (r["doc_id"], r["chunk_no"]): r.asDict()
        for r in chunk_chars(docs, size=10, stride=8).collect()
    }
    # empty doc: exactly one empty chunk at offset 0
    assert out[(0, 0)]["chunk"] == "" and out[(0, 0)]["chunk_len"] == 0
    assert (0, 1) not in out
    # len 10, stride 8 → full window at 0 plus a tail window at 8
    assert out[(1, 0)]["chunk"] == "abcdefghij"
    assert out[(1, 1)]["chunk"] == "ij"
    assert (1, 2) not in out
    # 25-char doc: starts 0,8,16,24; overlap of 2 chars between windows
    chunks2 = [out[(2, i)] for i in range(4)]
    assert [c["chunk_start"] for c in chunks2] == [0, 8, 16, 24]
    assert [c["chunk_len"] for c in chunks2] == [10, 10, 9, 1]
    # overlap: last 2 chars of window i == first 2 of window i+1
    assert chunks2[0]["chunk"][8:] == chunks2[1]["chunk"][:2]


def test_chunk_chars_short_doc_gets_tail_windows(docs):
    # len 10, stride 8 → starts 0 and 8 (8 <= 9): tail window "ij"
    out = chunk_chars(docs.filter("doc_id = 1"), size=10, stride=8).collect()
    got = {r["chunk_start"]: r["chunk"] for r in out}
    assert got == {0: "abcdefghij", 8: "ij"}


def test_chunk_chars_nonoverlapping_reconstructs(docs):
    """stride == size → concatenating chunks in order rebuilds the doc."""
    rows = chunk_chars(docs, size=7, stride=7).orderBy("doc_id", "chunk_no").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in originals.items():
        assert "".join(by_doc[doc_id]) == text


def test_chunk_tokens_windows(docs):
    out = chunk_tokens(docs.filter("doc_id = 3"), size=4, stride=3).collect()
    got = {r["chunk_id"]: r.asDict() for r in out}
    # 9 tokens, stride 3 → chunk starts at token offsets 0,3,6 (= id*stride)
    assert sorted(got) == [0, 1, 2]
    assert got[0]["chunk_text"] == "the quick brown fox"
    assert got[1]["chunk_text"] == "fox jumps over the"  # 1-token overlap
    assert got[2]["chunk_text"] == "the lazy dog"
    assert [got[i]["n_tokens"] for i in range(3)] == [4, 4, 3]


def test_chunk_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        chunk_chars(docs, size=0, stride=8)
    with pytest.raises(ValueError):
        chunk_tokens(docs, size=4, stride=0)
    with pytest.raises(ValueError):
        chunk_tokens(docs, size=4, stride=5)  # stride > size drops tokens


def test_chunking_plan_has_no_shuffle(docs):
    """Chunking must stay a narrow per-row flat-map — an Exchange here
    would shuffle the full corpus text at 100 TB."""
    for df in (chunk_chars(docs, 96, 64), chunk_tokens(docs, 16, 12)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
