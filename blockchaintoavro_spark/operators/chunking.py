"""Document chunking for RAG / context-window prep (LLM-pipeline surface,
sibling of sequence packing in quality.py).

Splits documents into fixed-size overlapping windows — by characters or
by whitespace tokens — keeping provenance (``doc_id``, ``chunk_no``,
start offset) so chunks can be traced back and re-joined. This is the
standard retrieval-corpus prep step (chunk → embed → index) and the
counterpart of :func:`quality.pack_sequences` (which concatenates; this
splits).

Everything is built-in Catalyst expressions — ``sequence`` to enumerate
window starts, ``posexplode`` to flatten, ``substring``/``slice`` to cut
— so the whole operator is a narrow per-row flat-map: zero shuffle, no
Python, and the row amplification (~len/stride per doc) is exactly the
chunk output a 100 TB corpus chunker must materialize anyway. Compare
the reference's array-column convention (``BQRow.avsc:22-50`` — nested
repeated records carry per-element provenance the same way).

Empty documents yield one empty chunk (start 0) rather than vanishing —
dropping them silently would make chunk-count audits disagree with doc
counts; filter afterwards if undesired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_chars(
    df: DataFrame,
    size: int = 512,
    stride: int = 384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-window chunking: windows of ``size`` chars every
    ``stride`` chars (overlap = ``size - stride`` when stride < size).

    Output: ``(id, chunk_no, chunk_start, chunk, chunk_len)``, one row
    per window; the final window may be short (never empty unless the
    document is empty).
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - F.lit(1), F.lit(0)),
        F.lit(stride),
    )
    return (
        df.select(
            id_col,
            F.posexplode(starts).alias("chunk_no", "chunk_start"),
            text_col,
        )
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.substring(
                F.col(text_col), F.col("chunk_start") + F.lit(1), F.lit(size)
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


def chunk_tokens(
    docs: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding token-window chunking (RAG / retrieval indexing prep): cut
    each document's whitespace tokens into windows of ``size`` tokens
    starting every ``stride`` (overlap = size - stride), emitting
    ``(id, chunk_id, n_tokens, chunk_text)``; the token start offset of
    a chunk is ``chunk_id * stride``.

    The window generation is ``sequence`` + ``slice`` + ``posexplode`` —
    a Generate over row-local arrays with no shuffle and no Python; at
    100 TB the chunker is scan-stage-parallel and output size is a
    predictable ``~n_tokens/stride`` rows per doc. Chunk boundaries
    depend only on the document itself, so appends never re-chunk old
    rows (same determinism contract as hash_split).
    """
    if stride <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size (stride > size drops tokens)")
    toks = F.split(F.lower(F.col(text_col)), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, size))
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "_ctoks"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("_ctoks").cast("long").alias("n_tokens"),
            F.array_join("_ctoks", " ").alias("chunk_text"),
        )
    )
