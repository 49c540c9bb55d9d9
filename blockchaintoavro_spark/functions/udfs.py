"""UDF / UDAF / UDTF surface (SURVEY §2.6).

The reference's "UDFs" are bitcoinj-backed pure functions inside the
record-shaping pipeline: script→string, script→base58 address
(``BitcoinBlockHandler.java:136-153, 170-184``), work→terahash (:95-101).
work→terahash is a pure Catalyst expression (functions/try_pair.py); the
base58 address derivation has no Spark built-in, so it is the engine's
canonical **vectorized pandas UDF** example.

All pandas UDFs here are Arrow-batched (Series→Series) — the closures are
self-contained so executors need no package import.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def base58_encode_py(raw: bytes | None) -> str | None:
    """Pure-python base58 (bitcoin alphabet), incl. leading-zero rule.

    Reference analog: ``Address#toBase58`` used at
    ``BitcoinBlockHandler.java:148-153``.
    """
    if raw is None:
        return None
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def base58check_encode_py(raw: bytes | None) -> str | None:
    """Base58Check (bitcoinj ``Address#toBase58`` exact semantics,
    ``BitcoinBlockHandler.java:148-153``): payload + first 4 bytes of
    double-SHA256 checksum, then raw base58."""
    import hashlib

    if raw is None:
        return None
    chk = hashlib.sha256(hashlib.sha256(raw).digest()).digest()[:4]
    return base58_encode_py(raw + chk)


@pandas_udf("string")
def base58check_encode(s: pd.Series) -> pd.Series:
    """Vectorized Base58Check of a binary column (Arrow-batched)."""
    import hashlib

    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    def enc(raw):
        if raw is None:
            return None
        raw = bytes(raw)
        raw += hashlib.sha256(hashlib.sha256(raw).digest()).digest()[:4]
        n = int.from_bytes(raw, "big")
        out = []
        while n > 0:
            n, r = divmod(n, 58)
            out.append(alphabet[r])
        pad = 0
        for b in raw:
            if b == 0:
                pad += 1
            else:
                break
        return "1" * pad + "".join(reversed(out))

    return s.map(enc)


@pandas_udf("string")
def base58_encode(s: pd.Series) -> pd.Series:
    """Vectorized base58 of a binary column (Arrow-batched)."""
    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    def enc(raw):
        if raw is None:
            return None
        n = int.from_bytes(bytes(raw), "big")
        out = []
        while n > 0:
            n, r = divmod(n, 58)
            out.append(alphabet[r])
        pad = 0
        for b in bytes(raw):
            if b == 0:
                pad += 1
            else:
                break
        return "1" * pad + "".join(reversed(out))

    return s.map(enc)


@pandas_udf("double")
def centroid_norm(emb: pd.Series) -> float:
    """Grouped-agg pandas UDAF: L2 norm of the per-group centroid vector.

    Usage: ``df.groupBy("label").agg(centroid_norm("embedding"))``. Arrow
    hands each group's embedding column as one Series of lists; numpy does
    the column mean. Scale note: grouped-agg UDAFs materialize one group
    per call — fine for bounded-cardinality labels; for high-cardinality
    keys use applyInPandas with partial aggregation instead.
    """
    import numpy as np

    m = np.mean(np.stack(emb.map(np.asarray, na_action="ignore")), axis=0)
    return float(np.sqrt((m * m).sum()))


def tokenizer_udtf_class():
    """Spark 4 UDTF: one (pos, token) row per whitespace token.

    Returned lazily as a class so importing this module never requires the
    UDTF machinery (and stays picklable by value).
    """

    class Tokenize:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            if text is None:
                return
            for pos, tok in enumerate(text.lower().split()):
                yield doc_id, pos, tok

    return Tokenize


def register_all(spark: SparkSession) -> None:
    """SQL-name registration (SURVEY §2.6 'Registration' row)."""
    spark.udf.register("base58_encode", base58_encode)
    spark.udf.register("base58check_encode", base58check_encode)
    spark.udf.register("centroid_norm", centroid_norm)
    try:
        from pyspark.sql.functions import udtf

        spark.udtf.register(
            "tokenize", udtf(tokenizer_udtf_class(), returnType="doc_id long, pos int, token string")
        )
    except Exception:
        pass  # UDTF registration is best-effort across minor versions
