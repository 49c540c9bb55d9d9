"""Pure-python Base58 / Base58Check / script-to-address twins.

Spark-free ON PURPOSE: the pandas UDFs in ``udfs.py`` delegate here, and
cloudpickle serializes those lambdas with a BY-REFERENCE link to this
module — so Python workers import *this* file, which must never require
an active SparkSession (``udfs.py`` itself cannot be imported on a bare
worker: its module-level ``@pandas_udf("string")`` decorators parse DDL
type strings through the JVM). Keeping one copy of the alphabet, the
encode loop, and the script byte-patterns removes the drift hazard of
the previous three inlined copies.
"""

from __future__ import annotations

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
