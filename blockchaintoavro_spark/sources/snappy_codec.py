"""Pure-Python raw-Snappy codec (the block format, not the framing format).

Implements Google's public Snappy format description
(https://github.com/google/snappy/blob/main/format_description.txt) from
scratch so the Avro OCF codec (sources/avro_io.py) can read and write
``avro.codec: snappy`` container files — the other codec the ecosystem
commonly writes besides null/deflate — without any native library. The
container this codec lives in is validated both directions against
snappy-java (the exact implementation the reference's Avro writer stack
would load, bundled in PySpark's JVM): our compressed bytes must be
readable by ``org.apache.avro.file.DataFileReader`` and we must read
files written by ``DataFileWriter`` with ``CodecFactory.snappyCodec()``
(tests/test_avro.py).

Decompression handles the full tag set (literals with 1-4 extra length
bytes; copies with 1-, 2- and 4-byte offsets, including overlapping
runs). Compression is the classic greedy hash-table match finder over
4-byte sequences emitting 2-byte-offset copies — a strict subset of the
format every decoder must accept, chosen because it keeps the encoder
small while still compressing repetitive text well. This is a
per-block codec: Avro blocks are bounded by the writer's batch size, so
the Python-side cost is O(block), never O(file).
"""

from __future__ import annotations

import struct

_MAX_COPY_LEN = 64  # 2-byte-offset copy tag encodes len-1 in 6 bits
_MIN_MATCH = 4
_MAX_OFFSET_2B = 65535


class SnappyError(ValueError):
    pass


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if i >= len(data):
            raise SnappyError("truncated varint length header")
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 35:
            raise SnappyError("varint length header too long")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    """Literal element(s) for data[start:end]; splits runs the tag byte
    can't express (len-1 must fit the chosen length encoding).

    Deliberate subset: the 3-/4-byte literal-length encodings are never
    emitted — runs over 64 KiB are split into multiple literal elements
    instead. Every conforming decoder must accept this (the spec makes
    length encodings interchangeable), and Avro blocks are batch-bounded
    so the extra tag bytes are noise; it keeps the encoder branch-free.
    The decoder side (:func:`decompress`) accepts all four encodings."""
    while start < end:
        n = end - start
        if n <= 60:
            out.append((n - 1) << 2)
        elif n <= 0x100:
            out.append(60 << 2)
            out.append(n - 1)
        else:  # 2-byte length covers 64 KiB per element; split longer runs
            n = min(n, 0x10000)
            out.append(61 << 2)
            out += struct.pack("<H", n - 1)
        out += data[start : start + n]
        start += n


def compress(data: bytes) -> bytes:
    """Greedy hash-match Snappy encoder (2-byte-offset copies only — a
    valid subset of the format). Round-trip and cross-impl tested."""
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # last 3 bytes can never start a 4-byte match
    while i + _MIN_MATCH <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= _MAX_OFFSET_2B and data[cand : cand + 4] == key:
            # extend the match forward
            m = _MIN_MATCH
            limit = n - i
            while m < limit and data[cand + m] == data[i + m]:
                m += 1
            _emit_literal(out, data, lit_start, i)
            off = i - cand
            left = m
            while left > 0:  # 2-byte-offset copies legally encode len 1..64
                step = min(left, _MAX_COPY_LEN)
                out.append(((step - 1) << 2) | 2)
                out += struct.pack("<H", off)
                left -= step
            i += m
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Full-format Snappy decoder: all literal length encodings and all
    three copy offset widths, with overlap-correct back-references."""
    expected, i = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while i < n:
        if len(out) > expected:
            # fail fast: a malformed stream must not grow the output
            # arbitrarily past the declared length before we notice
            raise SnappyError(
                f"decompressed past declared length {expected} at input byte {i}"
            )
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if i + nb > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[i : i + nb], "little")
                i += nb
            ln += 1
            if i + ln > n:
                raise SnappyError("truncated literal body")
            out += data[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if i >= n:
                raise SnappyError("truncated 1-byte copy")
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if i + 2 > n:
                raise SnappyError("truncated 2-byte copy")
            off = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if i + 4 > n:
                raise SnappyError("truncated 4-byte copy")
            off = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise SnappyError("copy offset out of range")
        start = len(out) - off
        if off >= ln:
            out += out[start : start + ln]
        else:  # overlapping run: byte-at-a-time replication per spec
            for _ in range(ln):
                out.append(out[start])
                start += 1
    if len(out) != expected:
        raise SnappyError(f"decompressed {len(out)} bytes, header said {expected}")
    return bytes(out)
