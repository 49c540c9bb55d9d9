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
- AVI: single ``vids`` stream, ``MJPG`` fourcc, uncompressed index
  optional (``idx1`` written but ignored on read — frames are recovered
  from the ``movi`` LIST walk, the robust path for truncated files).
- Frames: any bytes whose consumer understands them; the encoder is
  codec-agnostic (callers pass encoded JPEG bytes), the decoder returns
  the raw per-frame payloads so downstream chooses when to pay for
  pixel decode (at 100 TB you sample frames BEFORE decoding pixels).
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
    width: int, height: int, frames: list[bytes], usec_per_frame: int = 40000
) -> bytes:
    """Encoded frame payloads (e.g. JPEG bytes from jpeg.encode_jpeg) →
    a standard single-video-stream MJPG AVI file with an ``idx1`` index.
    """
    if not frames:
        raise ValueError("AVI needs at least one frame")
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, usec_per_frame, 1_000_000,
                      0, len(frames), 0, 0xFFFFFFFF, 0)
        # rcFrame is 16-bit per the stream-header struct; the true dims
        # live in the 32-bit avih fields (which the decoder reads), so
        # oversized frames clamp here instead of failing the pack
        + struct.pack("<4H", 0, 0, min(width, 0xFFFF), min(height, 0xFFFF))
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        min(width * height * 3, 0xFFFFFFFF),  # advisory for compressed streams
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc within movi
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
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
        "frames": frames,
    }


def try_decode_video(data: bytes | None) -> dict | None:
    """Magic-byte dispatch: decode if it looks like an AVI, else None
    (mirrors imaging.try_decode_image / audio.try_decode_audio)."""
    if data is None or len(data) < 12:
        return None
    if data[:4] == AVI_MAGIC_RIFF and data[8:12] == AVI_MAGIC_AVI:
        return decode_avi(bytes(data))
    return None
