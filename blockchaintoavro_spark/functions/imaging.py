"""Pure-Python image codecs for the multimodal (X5) pipeline — NO Spark
imports (workers import this module directly, the same pure-twin contract
as base58.py).

The container ships no PIL/ffmpeg, but PNG needs only ``zlib`` + ``struct``
(both stdlib) and BMP is plain struct parsing — so the X5 decode step can
be REAL for these two formats (r3 VERDICT #3), with the deterministic stub
remaining only as the fallback for genuinely undecodable modalities
(operators/multimodal.py). Baseline JPEG (r4 VERDICT #1) and GIF —
including multi-frame — live in the sibling modules ``jpeg.py`` /
``gif.py`` and are dispatched from :func:`try_decode_image` below;
:func:`resize_nearest` / :func:`resize_box` give the real resize step
over any decoded format.

Scope (documented subset, not a general imaging library):
- PNG (spec: https://www.w3.org/TR/png-3/): 8-bit and 16-bit depths
  (16-bit samples unfilter at their stored width, then reduce to the
  8-bit pixel contract by keeping the high byte — the standard 8-bit
  rendering of photographic PNGs; r6), color types 0 (gray), 2 (RGB),
  3 (palette — PLTE lookup, tRNS alpha → RGBA; 8-bit only),
  4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth); non-interlaced AND Adam7-interlaced
  streams (7-pass sub-image unfilter + scatter — the web-crawl
  progressive-render variant; r6); chunk CRCs verified.
- BMP (BITMAPINFOHEADER): uncompressed 8/24/32 bpp, bottom-up or
  top-down; 8 bpp returns palette indices as pixels.

Encoders exist so tests and declared queries can build deterministic
fixtures without any external tool: ``encode_png`` (filter 0 rows) and
``encode_bmp`` (24 bpp). Round-trip identity is property-tested.

Decoded pixels are returned in row-major top-down scan order, channels
interleaved exactly as stored (PNG: RGB(A)/gray; BMP: BGR) — feature
extraction downstream reduces them (dims + checksum), so no color-space
conversion is performed here.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard shared by every decoder (PNG/BMP/JPEG/GIF/AVI
# compositing): a corrupt header can declare billions of pixels, turning
# one bad payload into an executor-killing allocation/CPU bomb (fuzzing
# caught multi-second GIF composites from flipped dimension bytes).
# 2^26 pixels = an 8192x8192 frame = 200 MB RGB - far beyond anything
# this pipeline decodes; implausible dims raise the loud ValueError that
# try_decode_* turns into the stub fallback.
MAX_DECODE_PIXELS = 1 << 26


def check_dims(w: int, h: int, what: str) -> None:
    """Raise on implausible decoded dimensions (see MAX_DECODE_PIXELS)."""
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(f"implausible {what} dimensions {w}x{h}")

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_CTYPE = {1: 0, 3: 2, 2: 4, 4: 6}

# Adam7 interlace passes: (xstart, ystart, xstep, ystep) per the spec's
# pixel-distribution diagram
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, p: int, h: int, stride: int, bpp: int) -> tuple[bytearray, int]:
    """Unfilter ``h`` scanlines of ``stride`` bytes starting at offset
    ``p`` (each preceded by its filter byte); returns (pixels, new_p).
    ``bpp`` is bytes per pixel (the filter's left-neighbor distance)."""
    out = bytearray()
    prev = bytearray(stride)
    for _ in range(h):
        if p >= len(raw):
            raise ValueError("PNG pixel data size mismatch")
        f = raw[p]
        p += 1
        cur = bytearray(raw[p : p + stride])
        if len(cur) != stride:
            raise ValueError("PNG pixel data size mismatch")
        p += stride
        if f == 1:  # Sub — per-lane mod-256 prefix sum (vectorized;
            # addition is associative mod 256, so cumsum & 0xFF equals
            # the sequential left-neighbor recurrence byte-for-byte)
            import numpy as np

            arr = np.frombuffer(bytes(cur), dtype=np.uint8).copy()
            for lane in range(bpp):
                seg = arr[lane::bpp]
                arr[lane::bpp] = (
                    np.cumsum(seg, dtype=np.int64) & 0xFF
                ).astype(np.uint8)
            cur = bytearray(arr.tobytes())
        elif f == 2:  # Up — elementwise wrap-add against the prior row
            import numpy as np

            arr = np.frombuffer(bytes(cur), dtype=np.uint8) + np.frombuffer(
                bytes(prev), dtype=np.uint8
            )  # uint8 addition wraps mod 256
            cur = bytearray(arr.tobytes())
        elif f == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        out += cur
        prev = cur
    return out, p


def decode_png(data: bytes) -> dict:
    """PNG → ``{format, width, height, channels, pixels}``.

    Full scanline unfiltering per the spec (per-pass for Adam7
    streams); palette images expand through PLTE (+tRNS alpha); chunk
    CRCs are verified so a corrupt payload raises instead of yielding
    silently wrong pixels.
    """
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = ctype = None
    interlace = 0
    plte = None
    trns = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        if len(chunk) < ln or pos + ln + 4 > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + ln : pos + ln + 4])
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        pos += ln + 4
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth not in (8, 16) or (depth == 16 and ctype == 3):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            check_dims(w, h, "PNG")
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = bytes(chunk)
        elif typ == b"tRNS":
            trns = bytes(chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG has no IHDR")
    channels = _PNG_CHANNELS[ctype]
    # bytes per pixel as stored (16-bit samples are 2 bytes each; the
    # filter's left-neighbor distance follows the stored layout)
    bpp = channels * (depth // 8)
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        out, p = _png_unfilter(raw, 0, h, w * bpp, bpp)
        if p != len(raw):
            raise ValueError("PNG pixel data size mismatch")
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        out = bytearray(w * h * bpp)
        p = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            sub, p = _png_unfilter(raw, p, ph, pw * bpp, bpp)
            for j in range(ph):
                for i in range(pw):
                    dst = ((ys + j * ystep) * w + (xs + i * xstep)) * bpp
                    src = (j * pw + i) * bpp
                    out[dst : dst + bpp] = sub[src : src + bpp]
        if p != len(raw):
            raise ValueError("PNG pixel data size mismatch")
    if depth == 16:
        # reduce big-endian 16-bit samples to the 8-bit pixel contract
        # by keeping the high byte (the spec-blessed approximation —
        # what every 8-bit consumer of 16-bit PNGs renders)
        out = out[0::2]
    if ctype == 3:  # palette expansion (indices → RGB, or RGBA w/ tRNS)
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        n_entries = len(plte) // 3
        channels = 4 if trns is not None else 3
        expanded = bytearray(w * h * channels)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                raise ValueError(f"palette index {idx} out of range")
            o = i * channels
            expanded[o : o + 3] = plte[3 * idx : 3 * idx + 3]
            if channels == 4:
                expanded[o + 3] = trns[idx] if idx < len(trns) else 255
        out = expanded
    return {
        "format": "png",
        "width": w,
        "height": h,
        "channels": channels,
        "pixels": bytes(out),
    }


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Minimal spec-valid PNG writer (filter 0 scanlines, one IDAT)."""
    if channels not in _PNG_CTYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixels length != width*height*channels")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, _PNG_CTYPE[channels], 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes, expand_palette: bool = False) -> dict:
    """BMP (BITMAPINFOHEADER, uncompressed 8/24/32 bpp) →
    ``{format, width, height, channels, pixels}`` with rows returned
    top-down regardless of on-disk orientation.

    8 bpp returns palette INDICES as pixels by default (the documented
    historical contract); ``expand_palette=True`` looks each index up in
    the color table that follows the header (BGRA entries) and returns
    3-channel BGR like the 24 bpp path — what indexed screenshots/icons
    in a crawl need (r6; the PNG/GIF decoders already expand)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    offset = struct.unpack("<I", data[10:14])[0]
    hdrsize, w, h_signed = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0]
    if hdrsize < 40:
        raise ValueError(f"unsupported BMP header size {hdrsize}")
    if comp != 0:
        raise ValueError(f"compressed BMP unsupported (method {comp})")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if w <= 0 or h_signed == 0:
        raise ValueError("degenerate BMP dimensions")
    check_dims(w, abs(h_signed), "BMP")
    top_down = h_signed < 0
    h = abs(h_signed)
    channels = bpp // 8
    stride = ((w * channels + 3) // 4) * 4  # rows pad to 4 bytes
    rows = []
    for r in range(h):
        start = offset + r * stride
        row = data[start : start + w * channels]
        if len(row) < w * channels:
            raise ValueError("truncated BMP pixel data")
        rows.append(row)
    if not top_down:
        rows.reverse()  # stored bottom-up: normalize to top-down
    out = b"".join(rows)
    if bpp == 8 and expand_palette:
        # color table: biClrUsed entries (0 → 2^8) of BGRA directly
        # after the info header (and before any gap to the pixel offset)
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        tab_off = 14 + hdrsize
        table = data[tab_off : tab_off + 4 * n_colors]
        if len(table) < 4 * n_colors:
            raise ValueError("truncated BMP color table")
        expanded = bytearray(w * h * 3)
        for i, idx in enumerate(out):
            if idx >= n_colors:
                raise ValueError(f"BMP palette index {idx} out of range")
            expanded[3 * i : 3 * i + 3] = table[4 * idx : 4 * idx + 3]
        out = bytes(expanded)
        channels = 3
    return {
        "format": "bmp",
        "width": w,
        "height": h,
        "channels": channels,
        "pixels": out,
    }


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24 bpp bottom-up BMP writer (pixels given top-down BGR)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels length != width*height*3")
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        pixels[r * width * 3 : (r + 1) * width * 3] + pad
        for r in range(height - 1, -1, -1)  # bottom-up storage order
    )
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def try_decode_image(payload: bytes | None) -> dict | None:
    """Dispatch on magic bytes; None when the payload is not a decodable
    PNG/BMP/JPEG/GIF (caller falls back to the deterministic stub).

    Corrupt magic-matched payloads surface as more than ValueError —
    fuzzing found zlib.error from mangled IDAT streams and IndexError
    from truncated JPEG bitstreams / out-of-range GIF codes — so the
    totality contract ("one corrupt payload cannot fail a 100 TB
    stage") catches the full corrupt-data error set, while anything
    else (a genuine codec bug) still raises loudly."""
    if not payload:
        return None
    b = bytes(payload)
    try:
        if b[:8] == PNG_MAGIC:
            return decode_png(b)
        if b[:2] == b"BM":
            return decode_bmp(b)
        if b[:2] == b"\xff\xd8":
            from blockchaintoavro_spark.functions.jpeg import decode_jpeg

            return decode_jpeg(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            from blockchaintoavro_spark.functions.gif import decode_gif

            return decode_gif(b)
    except (ValueError, IndexError, KeyError, OverflowError, EOFError,
            struct.error, zlib.error):
        return None
    return None


def resize_nearest(
    pixels: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int, channels: int = 1
) -> bytes:
    """Nearest-neighbor resample (floor mapping ``sx = x·src_w // dst_w``)
    over interleaved channels. The mapping is pure integer arithmetic, so
    an SQL oracle can recompute any resized pixel from the source pattern
    (the x_resize declared query)."""
    if len(pixels) != src_w * src_h * channels:
        raise ValueError("pixels length != src_w*src_h*channels")
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError("degenerate target dimensions")
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(src_h, src_w, channels)
    sy = (np.arange(dst_h, dtype=np.int64) * src_h) // dst_h
    sx = (np.arange(dst_w, dtype=np.int64) * src_w) // dst_w
    return a[sy][:, sx].tobytes()


def resize_box(
    pixels: bytes, src_w: int, src_h: int, dst_w: int, dst_h: int, channels: int = 1
) -> bytes:
    """Box (area-mean) downsample: each output pixel is the floor-mean of
    its source box ``[x·sw//dw, (x+1)·sw//dw) × [y·sh//dh, (y+1)·sh//dh)``
    per channel. Deterministic integer math (known-answer tested)."""
    if len(pixels) != src_w * src_h * channels:
        raise ValueError("pixels length != src_w*src_h*channels")
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError("degenerate target dimensions")
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(src_h, src_w, channels)
    # 2-D integral image per channel: box sums become four corner lookups.
    # All math stays in int64 (total byte sum < 2^63 for any real image),
    # and floor division of non-negative ints matches the scalar //.
    integ = np.zeros((src_h + 1, src_w + 1, channels), dtype=np.int64)
    np.cumsum(np.cumsum(a, axis=0, dtype=np.int64), axis=1, out=integ[1:, 1:])
    ys = np.arange(dst_h, dtype=np.int64)
    y0 = ys * src_h // dst_h
    y1 = np.maximum((ys + 1) * src_h // dst_h, y0 + 1)
    xs = np.arange(dst_w, dtype=np.int64)
    x0 = xs * src_w // dst_w
    x1 = np.maximum((xs + 1) * src_w // dst_w, x0 + 1)
    sums = (
        integ[y1[:, None], x1[None, :]]
        - integ[y0[:, None], x1[None, :]]
        - integ[y1[:, None], x0[None, :]]
        + integ[y0[:, None], x0[None, :]]
    )
    cnt = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[:, :, None]
    return (sums // cnt).astype(np.uint8).tobytes()


def pixel_checksum(pixels: bytes) -> int:
    """Order-sensitive checksum over decoded pixels: positionally
    weighted byte sum ``Σ (i+1)·b_i  mod 2^31``. Weighted so a pixel
    permutation changes the value, but still plain SUM arithmetic — an
    SQL oracle can recompute it without any image code (the property
    the declared x_png_decode query's DuckDB twin relies on). One
    vectorized dot product (exact: values < 2^63 for any image below
    ~180 M bytes; the int64 bound guards the claim)."""
    import numpy as np

    b = np.frombuffer(pixels, dtype=np.uint8)
    if b.size == 0:
        return 0
    if b.size > 100_000_000:
        return sum((i + 1) * v for i, v in enumerate(pixels)) % (1 << 31)
    w = np.arange(1, b.size + 1, dtype=np.int64)
    return int(np.dot(w, b.astype(np.int64))) % (1 << 31)
