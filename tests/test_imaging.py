"""Real X5 decode (functions/imaging.py): known-answer vectors for every
PNG filter type, cross-validation against the JVM's javax.imageio (a
known-good third-party codec, the same parity pattern as the Avro Java
checks), hypothesis round-trips, and the Spark-level dispatch path.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blockchaintoavro_spark.functions.imaging import (
    PNG_MAGIC,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    pixel_checksum,
    try_decode_image,
)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png_from_filtered(width, height, channels, filtered_rows) -> bytes:
    """Assemble a PNG from pre-filtered scanlines (filter byte included)."""
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(filtered_rows)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_unfilter_known_answer_all_filters():
    """Hand-filtered scanlines (one per filter type 0-4) must decode to
    the hand-computed pixels — the unfilter math checked against the
    spec definitions, not against our own encoder."""
    w, ch = 4, 1  # 5 rows of 4 gray pixels
    pixels = [
        [10, 20, 30, 40],      # row 0: filter 0 (None)
        [15, 25, 35, 45],      # row 1: filter 1 (Sub):    raw = cur - left
        [17, 27, 37, 47],      # row 2: filter 2 (Up):     raw = cur - up
        [20, 30, 40, 50],      # row 3: filter 3 (Average) raw = cur - (l+u)//2
        [25, 35, 45, 55],      # row 4: filter 4 (Paeth)
    ]
    rows = []
    # row 0, None: stored as-is
    rows.append(bytes([0] + pixels[0]))
    # row 1, Sub: left neighbor within the row
    r = pixels[1]
    rows.append(bytes([1] + [r[0]] + [(r[i] - r[i - 1]) & 0xFF for i in range(1, w)]))
    # row 2, Up: neighbor from row 1
    rows.append(bytes([2] + [(pixels[2][i] - pixels[1][i]) & 0xFF for i in range(w)]))
    # row 3, Average of left (same row) and up (row 2)
    r, up = pixels[3], pixels[2]
    avg = [
        (r[i] - (((r[i - 1] if i else 0) + up[i]) >> 1)) & 0xFF for i in range(w)
    ]
    rows.append(bytes([3] + avg))
    # row 4, Paeth(left, up, upleft) — with these monotone rows the
    # predictor resolves to left for i>0 and up for i=0
    r, up = pixels[4], pixels[3]
    pae = [(r[0] - up[0]) & 0xFF] + [
        (r[i] - _paeth(r[i - 1], up[i], up[i - 1])) & 0xFF for i in range(1, w)
    ]
    rows.append(bytes([4] + pae))

    data = _png_from_filtered(w, len(pixels), ch, rows)
    info = decode_png(data)
    assert (info["width"], info["height"], info["channels"]) == (w, 5, 1)
    assert list(info["pixels"]) == [p for row in pixels for p in row]


def _paeth(a, b, c):
    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def test_png_rejects_corrupt_crc():
    data = bytearray(encode_png(3, 2, bytes(range(6)), 1))
    data[-6] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_pixel_checksum_known_vector():
    # 1*5 + 2*0 + 3*255 = 770; order sensitivity: swapping changes it
    assert pixel_checksum(bytes([5, 0, 255])) == 770
    assert pixel_checksum(bytes([255, 0, 5])) == 270
    assert pixel_checksum(b"") == 0


def test_bmp_known_answer_bottom_up_and_padding():
    """3x2 24bpp BMP: stored bottom-up with 4-byte row padding; decode
    must return top-down pixels with padding stripped."""
    top_down_bgr = bytes(range(18))  # 2 rows x 3 px x BGR
    data = encode_bmp(3, 2, top_down_bgr)
    # encoder stores the LAST logical row first on disk
    stride = 12  # 3*3 rounded up to 4
    offset = 54
    assert data[offset : offset + 9] == top_down_bgr[9:18]
    info = decode_bmp(data)
    assert (info["width"], info["height"], info["channels"]) == (3, 2, 3)
    assert info["pixels"] == top_down_bgr
    assert len(data) == offset + 2 * stride


def test_imageio_reads_our_png_and_bmp(spark):
    """Cross-codec parity: the JVM's javax.imageio (shipping with the
    Spark JVM) must read our encoder's output with identical dims and
    pixel values — the same third-party-validator pattern as the Avro
    Java parity tests."""
    import tempfile

    w, h = 5, 4
    rgb = bytes((13 * i) % 256 for i in range(w * h * 3))
    jvm = spark.sparkContext._jvm

    with tempfile.NamedTemporaryFile(suffix=".png") as fh:
        fh.write(encode_png(w, h, rgb, channels=3))
        fh.flush()
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(fh.name))
        assert (img.getWidth(), img.getHeight()) == (w, h)
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 3
                want = (0xFF << 24) | (rgb[i] << 16) | (rgb[i + 1] << 8) | rgb[i + 2]
                assert img.getRGB(x, y) & 0xFFFFFFFF == want

    # BMP stores BGR; the same RGB triple list maps to reversed bytes
    with tempfile.NamedTemporaryFile(suffix=".bmp") as fh:
        bgr = b"".join(
            bytes([rgb[i + 2], rgb[i + 1], rgb[i]]) for i in range(0, len(rgb), 3)
        )
        fh.write(encode_bmp(w, h, bgr))
        fh.flush()
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(fh.name))
        assert (img.getWidth(), img.getHeight()) == (w, h)
        for y in range(h):
            for x in range(w):
                i = (y * w + x) * 3
                want = (0xFF << 24) | (rgb[i] << 16) | (rgb[i + 1] << 8) | rgb[i + 2]
                assert img.getRGB(x, y) & 0xFFFFFFFF == want


def test_we_read_imageio_written_png(spark):
    """Inverse direction: a PNG written by the JVM codec (arbitrary
    filter choices we don't control) must decode to the same pixels."""
    import tempfile

    w, h = 6, 5
    jvm = spark.sparkContext._jvm
    img = jvm.java.awt.image.BufferedImage(w, h, 5)  # TYPE_3BYTE_BGR
    expect = []
    for y in range(h):
        for x in range(w):
            r, g, b = (x * 40) % 256, (y * 50) % 256, (x * y * 7) % 256
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            expect += [r, g, b]
    with tempfile.NamedTemporaryFile(suffix=".png") as fh:
        jvm.javax.imageio.ImageIO.write(img, "png", jvm.java.io.File(fh.name))
        with open(fh.name, "rb") as rd:
            info = decode_png(rd.read())
    assert (info["width"], info["height"], info["channels"]) == (w, h, 3)
    assert list(info["pixels"]) == expect


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, channels, seed):
    n = w * h * channels
    px = bytes((seed * 2654435761 + i * 97) % 256 for i in range(n))
    info = decode_png(encode_png(w, h, px, channels))
    assert (info["width"], info["height"], info["channels"]) == (w, h, channels)
    assert info["pixels"] == px


@given(w=st.integers(1, 12), h=st.integers(1, 10), seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    px = bytes((seed * 40503 + i * 11) % 256 for i in range(w * h * 3))
    info = decode_bmp(encode_bmp(w, h, px))
    assert (info["width"], info["height"], info["channels"]) == (w, h, 3)
    assert info["pixels"] == px


def test_try_decode_image_dispatch():
    png = encode_png(2, 2, bytes(4), 1)
    assert try_decode_image(png)["format"] == "png"
    assert try_decode_image(encode_bmp(2, 2, bytes(12)))["format"] == "bmp"
    assert try_decode_image(b"plain text payload") is None
    assert try_decode_image(None) is None
    assert try_decode_image(b"") is None
    # BMP magic but garbage header: must refuse, not misparse
    assert try_decode_image(b"BM" + b"A" * 60) is None
    # PNG magic but truncated: refuse
    assert try_decode_image(PNG_MAGIC + b"\x00\x01") is None


def test_extract_features_real_decode_and_stub_fallback(spark):
    """Spark-level dispatch: a real PNG payload yields decoded dims +
    pixel checksum, a text payload falls back to the stub features."""
    from pyspark.sql import functions as F

    from blockchaintoavro_spark.operators.multimodal import extract_features

    w, h = 5, 3
    px = bytes((7 * i) % 256 for i in range(w * h))
    png = encode_png(w, h, px, 1)
    txt = b"not an image"
    df = spark.createDataFrame(
        [(1, bytearray(png), "image"), (2, bytearray(txt), "text")],
        "doc_id long, payload binary, modality string",
    )
    rows = {
        r["doc_id"]: r
        for r in extract_features(df).orderBy("doc_id").collect()
    }
    assert rows[1]["width"] == w and rows[1]["height"] == h
    assert rows[1]["checksum"] == pixel_checksum(px)
    assert rows[1]["n_bytes"] == len(png)
    assert rows[2]["width"] == txt[0] % 128 + 1  # stub path
    assert rows[2]["checksum"] == sum(txt) % (1 << 31)
