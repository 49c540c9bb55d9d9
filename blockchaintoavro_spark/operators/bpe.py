"""Byte-pair-encoding tokenizer training and application (LLM-pipeline
surface — the tokenizer-fitting step that precedes token counting /
sequence packing in quality.py).

Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units" — public algorithm): start from characters,
repeatedly merge the most frequent adjacent symbol pair. The standard
scale trick makes this tractable on any corpus size: train on the
**word-frequency table**, not the corpus — pair statistics only depend
on (distinct word, count), and the vocabulary is orders of magnitude
smaller than 100 TB of text.

Distribution strategy per merge step:
- re-derive each word's current symbols by applying the merges-so-far
  (broadcast list, Arrow-batched mapInPandas over the vocab table);
- count weighted adjacent pairs JVM-side (posexplode over a struct
  array — no string-concat ambiguity between ('ab','c') and ('a','bc'));
- the only driver-side data is the argmax pair: ``limit(1).collect()``
  of one row per step — a model parameter, same bounded-collect pattern
  as IVF centroids (similarity.py).

The vocab table is localCheckpoint-ed once so the n_merges iterations
re-scan a materialized table, not the corpus lineage (the connected-
components pattern, dedup.py). Each step re-applies the full merge list
(O(n_merges) per word) instead of mutating cached state — pure functions
of the data, nothing leaked (r3 epoch_shuffle lesson).

``apply_bpe`` then tokenizes the corpus with the learned merges:
row-local mapInPandas, merges broadcast, zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"  # Sennrich convention: marks word-final symbols


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word, in training order, each merge
    replacing all its non-overlapping occurrences left-to-right — the
    deterministic pure twin used by the trainer, the tokenizer AND the
    tests' reference implementation (one function, no drift)."""
    sym = list(word[:-len(END_OF_WORD)]) + [END_OF_WORD] if word.endswith(
        END_OF_WORD
    ) else list(word)
    for a, b in merges:
        if len(sym) < 2:
            break
        out = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → ``(word, n)`` frequency table (lower-cased, space-split —
    the functions/text.py tokenizer convention) with the ``</w>``
    end-of-word marker appended. One shuffle, vocab-sized output."""
    w = F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    return (
        df.select(w)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(F.concat("w", F.lit(END_OF_WORD)).alias("word"), "n")
    )


def _symbols_df(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Vocab table → (symbols array<string>, n) under the current merge
    list (broadcast via closure; Arrow-batched; row-local)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blockchaintoavro_spark.operators.bpe import segment_word

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "symbols": [segment_word(w, merges) for w in pdf["word"]],
                    "n": pdf["n"].values,
                }
            )

    return vocab.mapInPandas(run, schema="symbols array<string>, n long")


def train_bpe(
    vocab: DataFrame, n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a ``(word, n)`` table.

    Stops early when no pair reaches ``min_count``. Ties break on the
    pair's lexicographic order — deterministic across partitionings.
    The returned merge list is the model (ordered); feed it to
    :func:`apply_bpe`.
    """
    vocab = vocab.localCheckpoint(eager=True)  # materialize once, n_merges re-scans
    merges: list[tuple[str, str]] = []
    try:
        return _train_bpe_loop(vocab, n_merges, min_count, merges)
    finally:
        # the merge list is the model — the checkpointed vocab blocks are
        # dead once training returns; free them instead of leaking one
        # vocab-sized block set per training call into storage memory
        from ..session import release_local_checkpoint

        release_local_checkpoint(vocab)


def _train_bpe_loop(
    vocab: DataFrame,
    n_merges: int,
    min_count: int,
    merges: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    for _ in range(n_merges):
        sym = _symbols_df(vocab, merges)
        pairs = F.when(
            F.size("symbols") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("symbols") - 1),
                lambda i: F.struct(
                    F.element_at("symbols", i).alias("a"),
                    F.element_at("symbols", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array())
        best = (
            sym.select(F.explode(pairs).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        merges.append((best[0]["a"], best[0]["b"]))
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with learned merges: per doc, lower/space-split
    words → per-word subword segmentation → flat token array + count.
    Merges ride the closure (broadcast-sized model); row-local
    mapInPandas, zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from blockchaintoavro_spark.operators.bpe import (
            END_OF_WORD,
            segment_word,
        )

        cache: dict[str, list[str]] = {}  # corpora repeat words heavily

        def seg(word):
            got = cache.get(word)
            if got is None:
                got = cache[word] = segment_word(word + END_OF_WORD, merges)
            return got

        for pdf in batches:
            toks = [
                [
                    t
                    for w in str(text).lower().split(" ")
                    if w
                    for t in seg(w)
                ]
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "bpe_tokens": toks,
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    # derive the id field's type from the input instead of hardcoding
    # long, so string/int id columns pass through uncoerced (r5 ADVICE)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe_tokens long",
    )


def char_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Step-0 pair statistics straight from the corpus — the first
    merge's candidate table, SQL-expressible for the oracle: weighted
    counts of adjacent character pairs (with ``</w>`` marker) across
    words. Two keyed shuffles (word counts, then pair counts), both on
    bounded-cardinality keys."""
    wc = word_counts(df, text_col)
    # word is chars + "</w>"; with L = char count, positions 1..L yield
    # (c_i, c_i+1) for i < L and (c_L, </w>) for i = L — so every word,
    # even single-char, contributes at least one pair.
    last = F.length("word") - len(END_OF_WORD)
    pairs = F.transform(
        F.sequence(F.lit(1), last),
        lambda i: F.concat(
            F.substring("word", i, 1),
            F.lit("|"),
            F.when(i == last, F.lit(END_OF_WORD)).otherwise(
                F.substring("word", i + 1, 1)
            ),
        ),
    )
    return (
        wc.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
    )
