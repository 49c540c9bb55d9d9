"""Vectorized xxHash64 over fixed-width byte rows (numpy), bit-identical
to Spark's ``F.xxhash64`` on strings.

Why this exists: the sorted-gram substring-dedup plan
(operators/substr_sorted.py) computes one 64-bit fingerprint per sliding
k-char window of every document — ~one hash per corpus character. Doing
that as Catalyst ``transform(sequence(...), substring)`` + explode
materializes k bytes per position before hashing; doing it row-at-a-time
in Python is ~100× too slow. This module evaluates the PUBLIC xxHash64
algorithm (Yann Collet, BSD, https://github.com/Cyan4973/xxHash — spec
in doc/xxhash_spec.md) lane-parallel across ALL rows of an ``(n, L)``
uint8 matrix with numpy uint64 arithmetic, so a mapInPandas batch hashes
millions of windows in a handful of vector ops.

Seed 42 matches Spark's ``XxHash64`` expression (the engine's
``hash_only`` fingerprints are produced by ``F.xxhash64`` elsewhere, and
the two paths must agree exactly for the sorted-gram plan to be
twin-testable against the Catalyst plan). Verified bit-for-bit against
``F.xxhash64`` on random strings (incl. multi-byte UTF-8) in
tests/test_operators.py.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _u64_at(rows: np.ndarray, off: int) -> np.ndarray:
    """Little-endian u64 column gathered at byte offset ``off``."""
    return np.ascontiguousarray(rows[:, off : off + 8]).view("<u8").ravel()


def _u32_at(rows: np.ndarray, off: int) -> np.ndarray:
    return (
        np.ascontiguousarray(rows[:, off : off + 4])
        .view("<u4")
        .ravel()
        .astype(np.uint64)
    )


def xxhash64_rows(rows: np.ndarray, seed: np.uint64 = SPARK_SEED) -> np.ndarray:
    """xxHash64 of every row of an ``(n, L)`` uint8 array → ``(n,)``
    uint64. All rows share the byte length ``L`` (callers group
    variable-length inputs by length); the per-row control flow of the
    reference algorithm depends only on ``L``, so each step becomes one
    vectorized op across rows."""
    if rows.ndim != 2 or rows.dtype != np.uint8:
        raise ValueError("xxhash64_rows wants an (n, L) uint8 array")
    n, length = rows.shape
    pos = 0
    if length >= 32:
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the spec
            v1 = np.full(n, seed + _P1 + _P2, dtype=np.uint64)
            v2 = np.full(n, seed + _P2, dtype=np.uint64)
            v3 = np.full(n, seed, dtype=np.uint64)
            v4 = np.full(n, seed - _P1, dtype=np.uint64)
        while pos + 32 <= length:
            v1 = _rotl(v1 + _u64_at(rows, pos) * _P2, 31) * _P1
            v2 = _rotl(v2 + _u64_at(rows, pos + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + _u64_at(rows, pos + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + _u64_at(rows, pos + 24) * _P2, 31) * _P1
            pos += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * _P2, 31) * _P1)) * _P1 + _P4
    else:
        h = np.full(n, seed + _P5, dtype=np.uint64)
    h = h + np.uint64(length)
    while pos + 8 <= length:
        k1 = _rotl(_u64_at(rows, pos) * _P2, 31) * _P1
        h = _rotl(h ^ k1, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= length:
        h = _rotl(h ^ (_u32_at(rows, pos) * _P1), 23) * _P2 + _P3
        pos += 4
    while pos < length:
        h = _rotl(h ^ (rows[:, pos].astype(np.uint64) * _P5), 11) * _P1
        pos += 1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def window_hashes_concat(
    data: bytes, char_starts: np.ndarray, k: int
) -> np.ndarray:
    """xxHash64 (Spark seed) of every ``k``-CHAR sliding window of a
    UTF-8 byte buffer, vectorized across all positions at once.

    ``char_starts`` holds the byte offset of each character plus one
    final entry ``len(data)`` (for pure-ASCII text this is just
    ``arange``); window ``i`` (0-based char position) covers bytes
    ``char_starts[i] : char_starts[i+k]``. Multi-byte characters make
    window BYTE lengths vary, so positions are grouped by byte length
    and each group hashed as one fixed-width matrix — every group is
    one ``xxhash64_rows`` call, no per-position Python.

    Returns a ``(n_chars - k + 1,)`` uint64 array in position order
    (empty when the text is shorter than ``k`` chars).
    """
    n_chars = len(char_starts) - 1
    n_win = n_chars - k + 1
    if n_win <= 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    starts = char_starts[:n_win]
    ends = char_starts[k : k + n_win]
    lengths = ends - starts
    out = np.empty(n_win, dtype=np.uint64)
    if lengths.min() == lengths.max():
        # uniform byte width (ASCII the overwhelmingly common case).
        # sliding_window_view is a zero-copy strided view; stride-1
        # starts (pure ASCII) slice it directly, otherwise gather rows
        # (a memcpy-speed row gather — NOT an int64 index-matrix, which
        # profiled ~15× slower)
        width = int(lengths[0])
        view = np.lib.stride_tricks.sliding_window_view(buf, width)
        if int(starts[-1]) - int(starts[0]) == n_win - 1:
            rows = view[int(starts[0]) : int(starts[0]) + n_win]
        else:
            rows = view[starts]
        return xxhash64_rows(rows)
    for width in np.unique(lengths):
        sel = np.flatnonzero(lengths == width)
        view = np.lib.stride_tricks.sliding_window_view(buf, int(width))
        out[sel] = xxhash64_rows(view[starts[sel]])
    return out


def char_starts_of(data: bytes, n_chars: int) -> np.ndarray:
    """Byte offset of each character of a UTF-8 buffer, plus a trailing
    ``len(data)`` sentinel — ``arange`` for ASCII (detected by byte
    count == char count) else one vectorized continuation-byte mask
    (UTF-8 start bytes map 1:1 onto code points, i.e. Python chars)."""
    if len(data) == n_chars:
        return np.arange(n_chars + 1, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    starts = np.flatnonzero((buf & 0xC0) != 0x80).astype(np.int64)
    return np.append(starts, np.int64(len(data)))
