"""Pure-Python AVI (RIFF) / Motion-JPEG video container codec — NO Spark
imports (workers import this module directly; pure-twin contract as
imaging.py / jpeg.py / gif.py / audio.py).

Closes the video leg of X5 for real: AVI is the same RIFF chunk grammar
as WAV (audio.py) and Motion-JPEG frames are just the baseline JFIF
bytes jpeg.py already encodes/decodes — so a keyframe-extraction
pipeline (container parse → frame select → image decode) can run
genuinely end-to-end with zero external libs. The reference's analog is
the opaque-binary convention (``BQRow.avsc:6,20`` — payload bytes travel
untouched; derivations produce sibling typed columns).

Scope (documented subset, not a general video library):
- AVI: single ``vids`` stream, ``MJPG`` or uncompressed ``DIB ``
  (BI_RGB 24 bpp) fourcc, uncompressed index optional (``idx1`` written
  but ignored on read — frames are recovered from the ``movi`` LIST
  walk, the robust path for truncated files). The stream's fourcc and
  bit depth are parsed from ``strh``/``strf`` and surfaced so callers
  can route raw frames to :func:`dib_to_pixels` and compressed ones to
  the image decoders.
- Frames: any bytes whose consumer understands them; the encoder is
  codec-agnostic (callers pass encoded JPEG bytes or raw DIB rows), the
  decoder returns the raw per-frame payloads so downstream chooses when
  to pay for pixel decode (at 100 TB you sample frames BEFORE decoding
  pixels).
- Non-AVI RIFF (e.g. WAVE), missing headers, or truncated chunks raise
  ``ValueError`` — loud, not wrong.
"""

from __future__ import annotations

import struct

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_AVI = b"AVI "


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    usec_per_frame: int = 40000,
    fourcc: bytes = b"MJPG",
) -> bytes:
    """Encoded frame payloads (e.g. JPEG bytes from jpeg.encode_jpeg,
    or raw bottom-up BGR rows for ``fourcc=b"DIB "``) → a standard
    single-video-stream AVI file with an ``idx1`` index. Raw streams use
    ``00db`` frame chunks and ``biCompression=0`` per the RIFF/VFW
    convention; compressed streams use ``00dc``.
    """
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if len(fourcc) != 4:
        raise ValueError("fourcc must be 4 bytes")
    raw = fourcc == b"DIB "
    frame_cid = b"00db" if raw else b"00dc"
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, usec_per_frame, 1_000_000,
                      0, len(frames), 0, 0xFFFFFFFF, 0)
        # rcFrame is 16-bit per the stream-header struct; the true dims
        # live in the 32-bit avih fields (which the decoder reads), so
        # oversized frames clamp here instead of failing the pack
        + struct.pack("<4H", 0, 0, min(width, 0xFFFF), min(height, 0xFFFF))
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24,
        b"\x00\x00\x00\x00" if raw else fourcc,  # BI_RGB = 0 for raw DIB
        min(width * height * 3, 0xFFFFFFFF),  # advisory for compressed streams
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the frame fourcc within movi
        movi_body += _chunk(frame_cid, f)
    movi = _chunk(b"LIST", movi_body)
    idx = b"".join(
        frame_cid + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, frames)
    )
    body = AVI_MAGIC_AVI + hdrl + movi + _chunk(b"idx1", idx)
    return AVI_MAGIC_RIFF + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> dict:
    """AVI bytes → ``{format, width, height, n_frames, usec_per_frame,
    frames}`` with ``frames`` the raw per-frame payloads in stream order
    (pixel decode is the caller's choice — sample first, decode later).

    Frames come from walking the ``movi`` LIST (``00dc``/``00db``
    chunks); the optional ``idx1`` index is ignored so truncation shows
    up as a loud chunk error, never as silently resequenced frames.
    """
    if len(data) < 12 or data[:4] != AVI_MAGIC_RIFF or data[8:12] != AVI_MAGIC_AVI:
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    pos = 12
    width = height = n_declared = usec = None
    fourcc = b"\x00\x00\x00\x00"
    compression = None
    bit_count = None
    frames: list[bytes] = []
    while pos + 8 <= len(data):
        cid, ln = struct.unpack("<4sI", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        if len(chunk) < ln:
            raise ValueError("truncated AVI chunk")
        pos += ln + (ln & 1)
        if cid != b"LIST":
            continue  # idx1 / JUNK at top level
        kind, body = chunk[:4], chunk[4:]
        if kind == b"hdrl":
            # first sub-chunk must be avih
            if body[:4] != b"avih" or len(body) < 8 + 40:
                raise ValueError("AVI hdrl missing avih header")
            (aln,) = struct.unpack("<I", body[4:8])
            avih = body[8 : 8 + aln]
            if len(avih) < 40:
                raise ValueError("short avih chunk")
            usec = struct.unpack("<I", avih[0:4])[0]
            n_declared = struct.unpack("<I", avih[16:20])[0]
            width = struct.unpack("<I", avih[32:36])[0]
            height = struct.unpack("<I", avih[36:40])[0]
            # walk the rest of hdrl for the vids strl: strh carries the
            # handler fourcc, strf (BITMAPINFOHEADER) biCompression +
            # biBitCount — what tells downstream raw-DIB from MJPG
            hp = 8 + aln + (aln & 1)
            while hp + 8 <= len(body):
                scid, sln = struct.unpack("<4sI", body[hp : hp + 8])
                sbody = body[hp + 8 : hp + 8 + sln]
                hp += 8 + sln + (sln & 1)
                if scid != b"LIST" or sbody[:4] != b"strl":
                    continue
                sp = 4
                is_vids = False
                while sp + 8 <= len(sbody):
                    ccid, cln = struct.unpack("<4sI", sbody[sp : sp + 8])
                    cbody = sbody[sp + 8 : sp + 8 + cln]
                    sp += 8 + cln + (cln & 1)
                    if ccid == b"strh" and len(cbody) >= 8:
                        is_vids = cbody[:4] == b"vids"
                        if is_vids:
                            fourcc = cbody[4:8]
                    elif ccid == b"strf" and is_vids and len(cbody) >= 20:
                        bit_count = struct.unpack("<H", cbody[14:16])[0]
                        comp = struct.unpack("<I", cbody[16:20])[0]
                        compression = "raw" if comp == 0 else cbody[16:20].decode(
                            "latin-1"
                        )
        elif kind == b"movi":
            mp = 0
            while mp + 8 <= len(body):
                fcc, fln = struct.unpack("<4sI", body[mp : mp + 8])
                mp += 8
                payload = body[mp : mp + fln]
                if len(payload) < fln:
                    raise ValueError("truncated AVI frame chunk")
                mp += fln + (fln & 1)
                if fcc[2:4] in (b"dc", b"db"):
                    frames.append(payload)
    if width is None:
        raise ValueError("AVI missing hdrl/avih")
    if n_declared is not None and n_declared != len(frames):
        raise ValueError(
            f"AVI frame count mismatch: header {n_declared}, movi {len(frames)}"
        )
    return {
        "format": "avi",
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "usec_per_frame": usec,
        "fourcc": fourcc.decode("latin-1"),
        "compression": compression,
        "bit_count": bit_count,
        "frames": frames,
    }


def dib_to_pixels(payload: bytes, width: int, height: int, bit_count: int = 24) -> dict:
    """Uncompressed BI_RGB frame payload → the decoder pixel contract
    (``{format, width, height, channels, pixels}`` — RGB interleaved,
    top-down). DIB rows are stored bottom-up in BGR with each row padded
    to a 4-byte boundary (the same layout imaging.py's BMP decoder
    unpacks — a raw AVI frame is a BMP pixel array without the file
    header). 24 bpp only; other depths raise."""
    if bit_count != 24:
        raise ValueError(f"unsupported DIB bit depth {bit_count}")
    stride = (width * 3 + 3) & ~3
    if len(payload) < stride * height:
        raise ValueError(
            f"short DIB frame: {len(payload)} bytes for {width}x{height}x24"
        )
    out = bytearray(width * height * 3)
    for y in range(height):
        row = payload[(height - 1 - y) * stride :][: width * 3]
        o = y * width * 3
        for x in range(width):
            b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            out[o + 3 * x] = r
            out[o + 3 * x + 1] = g
            out[o + 3 * x + 2] = b
    return {
        "format": "dib",
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": bytes(out),
    }


def try_decode_video(data: bytes | None) -> dict | None:
    """Magic-byte dispatch: decode if it looks like an AVI or an
    ISO-BMFF/MP4 container, else None (mirrors
    imaging.try_decode_image / audio.try_decode_audio). MP4 results
    additionally carry ``keyframes`` (the stss sync-sample indices) so
    downstream samples keyframes BEFORE any pixel decode."""
    if data is None or len(data) < 12:
        return None
    if data[:4] == AVI_MAGIC_RIFF and data[8:12] == AVI_MAGIC_AVI:
        return decode_avi(bytes(data))
    if data[4:8] == b"ftyp":
        from blockchaintoavro_spark.functions.mp4 import decode_mp4

        return decode_mp4(bytes(data))
    return None
