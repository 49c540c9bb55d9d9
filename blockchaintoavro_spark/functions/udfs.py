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


def script_to_address_py(script: bytes | None) -> tuple[str | None, str | None]:
    """ScriptPubKey → mainnet base58 address, bitcoinj
    ``Script#getToAddress(MainNetParams).toBase58()`` semantics
    (``BitcoinBlockHandler.java:179-184``): returns ``(address, error)``
    mirroring the reference's value-or-error pair — a non-standard script
    yields ``(None, message)`` exactly like its ``ScriptException`` catch.

    Standard forms handled (the same set bitcoinj's getToAddress accepts):
    - P2PKH ``OP_DUP OP_HASH160 <20B> OP_EQUALVERIFY OP_CHECKSIG``
      → Base58Check(0x00 || hash)
    - P2PK ``<33|65B pubkey> OP_CHECKSIG`` → Base58Check(0x00 ||
      RIPEMD160(SHA256(pubkey)))
    - P2SH ``OP_HASH160 <20B> OP_EQUAL`` → Base58Check(0x05 || hash)

    Known-answer tested against the real mainnet Genesis coinbase output
    (tests/test_operators.py::test_script_to_address_mainnet_vectors).
    """
    import hashlib

    if script is None:
        return None, "null script"
    s = bytes(script)
    # P2PKH: 76 a9 14 <20> 88 ac
    if len(s) == 25 and s[:3] == b"\x76\xa9\x14" and s[23:] == b"\x88\xac":
        return base58check_encode_py(b"\x00" + s[3:23]), None
    # P2SH: a9 14 <20> 87
    if len(s) == 23 and s[:2] == b"\xa9\x14" and s[22] == 0x87:
        return base58check_encode_py(b"\x05" + s[2:22]), None
    # P2PK: <push n> <pubkey n bytes> ac, n in {33, 65}
    if (
        len(s) >= 2
        and s[0] in (33, 65)
        and len(s) == s[0] + 2
        and s[-1] == 0xAC
    ):
        h = hashlib.new("ripemd160", hashlib.sha256(s[1:-1]).digest()).digest()
        return base58check_encode_py(b"\x00" + h), None
    return None, "Cannot cast this script to a pay-to-address type"


@pandas_udf("string")
def script_to_address(s: pd.Series) -> pd.Series:
    """Vectorized scriptPubKey→address (Arrow-batched); non-standard
    scripts → null, matching the reference's error-field behavior."""
    import hashlib

    alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

    def b58check(raw: bytes) -> str:
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

    def derive(raw):
        if raw is None:
            return None
        sc = bytes(raw)
        if len(sc) == 25 and sc[:3] == b"\x76\xa9\x14" and sc[23:] == b"\x88\xac":
            return b58check(b"\x00" + sc[3:23])
        if len(sc) == 23 and sc[:2] == b"\xa9\x14" and sc[22] == 0x87:
            return b58check(b"\x05" + sc[2:22])
        if len(sc) >= 2 and sc[0] in (33, 65) and len(sc) == sc[0] + 2 and sc[-1] == 0xAC:
            h = hashlib.new("ripemd160", hashlib.sha256(sc[1:-1]).digest()).digest()
            return b58check(b"\x00" + h)
        return None

    return s.map(derive)


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
