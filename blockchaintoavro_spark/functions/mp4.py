"""Pure-Python MP4 / ISO-BMFF video container codec — NO Spark imports
(workers import this module directly; pure-twin contract as imaging.py /
jpeg.py / gif.py / audio.py / video.py).

Closes the VERDICT r14 #3 gap in the video family: the perceptual/clip
pipeline covered AVI only, but the dominant real-world crawl container
is MP4. This is a BOX-WALK parser over the published ISO/IEC 14496-12
grammar — ``ftyp``/``moov``/``trak``/``mdia``/``minf``/``stbl``, with
the sample tables decoded exactly as the spec composes them:

- ``stsd``  → codec sample-entry type + visual width/height,
- ``stts``  → sample timing (timescale from ``mdhd``),
- ``stss``  → the SYNC-SAMPLE (keyframe) table; ABSENT means every
  sample is a keyframe, per the spec,
- ``stsc`` + ``stco`` + ``stsz`` → per-sample byte ranges (chunk runs
  expanded, offsets summed within chunks).

The decoder returns raw per-sample payloads and the 0-based keyframe
index list WITHOUT any pixel decode — the same sample-first ordering
functions/video.py enforces for AVI: at 100 TB you choose keyframes
BEFORE paying for pixel decode. Motion-JPEG samples (sample entry
``jpeg``, the QuickTime-documented MJPEG-in-MP4 convention) are
complete JFIF images that functions/jpeg.py decodes.

Beyond the sample tables, the decoder carries the pieces a real
crawl-video indexer needs (VERDICT r15 #1/#8):

- the ``stsd`` DECODER-CONFIGURATION sub-box (``avcC``/``hvcC``/
  ``esds``/``vpcC``/``av1C``) is returned raw — for H.264/H.265 the
  sampled keyframes are bare NAL payloads that no decoder can consume
  without this record, so dropping it would make sampling useless on
  the dominant real-world codecs,
- ``ctts`` (composition offsets, v0 unsigned / v1 signed) and the
  ``trak``/``edts``/``elst`` edit list are parsed when present, and
  per-sample timestamps are exposed in BOTH orders: ``dts`` (decode
  order, from the full ``stts`` run expansion), ``pts`` (presentation
  timestamps, ctts + edit-list shift applied), and
  ``presentation_order`` (sample indices sorted by pts).

Every sample-table count is validated against its box body (and the
file) BEFORE any list is materialized: a single corrupted count byte
(e.g. ``stsz`` count=0xFFFFFFFF with a fixed size) must raise
``ValueError``, not allocate tens of GB and OOM-kill an executor fed
untrusted crawl payloads.

Scope (documented subset, not a general MP4 library): one video track
(the first ``vide``-handler trak), 32-bit box sizes (64-bit ``largesize``
accepted on the walk), no fragmented MP4 (``moof``) / encryption.
Non-BMFF input, a missing ``moov``/``stbl``, or sample ranges outside
the file raise ``ValueError`` — loud, not wrong.
"""

from __future__ import annotations

import struct

_FTYP = b"ftyp"
# containers whose children are themselves boxes
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}


def _u32(n: int) -> bytes:
    return struct.pack(">I", n)


def _box(btype: bytes, body: bytes) -> bytes:
    return _u32(8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _movie_boxes(
    width: int,
    height: int,
    timescale: int,
    duration: int,
    stbl: bytes,
    edts: bytes = b"",
    mvex: bytes = b"",
) -> bytes:
    """The ``moov`` for a one-video-track movie — vmhd/dinf/stbl under
    minf, hdlr+mdhd under mdia, tkhd(+edts) under trak, mvhd(+mvex) at
    the top. Shared by the flat and fragmented muxers (review r16: the
    two copies had already diverged once via the sample entry)."""
    url = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dinf = _box(b"dinf", _full(b"dref", 0, 0, _u32(1) + url))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        _u32(0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        _u32(0) + _u32(0) + _u32(timescale) + _u32(duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in-movie | in-preview
        _u32(0) + _u32(0) + _u32(1) + _u32(0) + _u32(duration)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
        + _u32(width << 16) + _u32(height << 16),
    )
    trak = _box(b"trak", tkhd + edts + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        _u32(0) + _u32(0) + _u32(timescale) + _u32(duration)
        + _u32(0x10000) + struct.pack(">H", 0x100) + b"\x00" * 10
        + _MATRIX + b"\x00" * 24 + _u32(2),  # next_track_ID
    )
    return _box(b"moov", mvhd + trak + mvex)


def encode_mp4(
    width: int,
    height: int,
    frames: list[bytes],
    keyframes: list[bool] | None = None,
    timescale: int = 1000,
    sample_delta: int = 40,
    codec: bytes = b"jpeg",
    codec_config: bytes | None = None,
    codec_config_type: bytes = b"avcC",
    ctts_offsets: list[int] | None = None,
    edit_media_time: int | None = None,
) -> bytes:
    """Sample payloads (e.g. JFIF bytes from jpeg.encode_jpeg) → a
    minimal valid ISO-BMFF file: ``ftyp`` + ``mdat`` + ``moov`` (moov
    last, so ``stco`` holds real absolute offsets). Samples are packed
    TWO per chunk (last chunk may hold one) so the decoder's
    ``stsc``/``stco``/``stsz`` expansion is genuinely exercised — a
    one-chunk layout would never catch a broken chunk-run walk.
    ``keyframes`` marks sync samples (``stss``); None means all sync
    and the ``stss`` box is omitted, which the spec defines as
    all-keyframes.

    ``codec_config`` appends a decoder-configuration sub-box (type
    ``codec_config_type``, e.g. ``avcC`` for an ``avc1`` entry) after
    the VisualSampleEntry fixed fields, body written verbatim.
    ``ctts_offsets`` (one composition offset per sample) emits a
    run-length-compressed ``ctts`` box — version 1 (signed) when any
    offset is negative, else version 0. ``edit_media_time`` emits a
    ``trak``/``edts``/``elst`` with one normal edit starting at that
    media time. All three default to absent so existing output bytes
    are unchanged."""
    if not frames:
        raise ValueError("MP4 needs at least one sample")
    if keyframes is not None and len(keyframes) != len(frames):
        raise ValueError("keyframes mask length != frame count")
    if ctts_offsets is not None and len(ctts_offsets) != len(frames):
        raise ValueError("ctts offsets length != frame count")
    if len(codec) != 4 or len(codec_config_type) != 4:
        raise ValueError("codec sample-entry/config type must be 4 bytes")
    n = len(frames)
    ftyp = _box(_FTYP, b"isom" + _u32(0x200) + b"isom" + b"iso2" + b"mp41")
    mdat_body = b"".join(frames)
    mdat_off = len(ftyp)
    # chunk layout: pairs of samples; absolute offsets into the file
    chunk_offsets = []
    pos = mdat_off + 8
    for i in range(0, n, 2):
        chunk_offsets.append(pos)
        pos += sum(len(f) for f in frames[i : i + 2])
    n_chunks = len(chunk_offsets)
    stsc_entries = [(1, 2, 1)]
    if n % 2 == 1:
        if n == 1:
            stsc_entries = [(1, 1, 1)]
        else:
            stsc_entries.append((n_chunks, 1, 1))

    duration = n * sample_delta
    entry = _visual_entry(width, height, codec_config, codec_config_type)
    stsd = _full(b"stsd", 0, 0, _u32(1) + _box(codec, entry))
    stts = _full(b"stts", 0, 0, _u32(1) + _u32(n) + _u32(sample_delta))
    ctts = b""
    if ctts_offsets is not None:
        runs: list[tuple[int, int]] = []
        for off in ctts_offsets:
            if runs and runs[-1][1] == off:
                runs[-1] = (runs[-1][0] + 1, off)
            else:
                runs.append((1, off))
        v = 1 if any(o < 0 for _, o in runs) else 0
        ctts = _full(
            b"ctts", v, 0,
            _u32(len(runs))
            + b"".join(
                _u32(c) + struct.pack(">i" if v else ">I", o)
                for c, o in runs
            ),
        )
    stss = b""
    if keyframes is not None:
        sync = [i + 1 for i, k in enumerate(keyframes) if k]
        stss = _full(
            b"stss", 0, 0, _u32(len(sync)) + b"".join(_u32(s) for s in sync)
        )
    stsc = _full(
        b"stsc",
        0,
        0,
        _u32(len(stsc_entries))
        + b"".join(_u32(a) + _u32(b) + _u32(c) for a, b, c in stsc_entries),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        _u32(0) + _u32(n) + b"".join(_u32(len(f)) for f in frames),
    )
    stco = _full(
        b"stco",
        0,
        0,
        _u32(n_chunks) + b"".join(_u32(o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + ctts + stss + stsc + stsz + stco)
    edts = b""
    if edit_media_time is not None:
        elst = _full(
            b"elst", 0, 0,
            _u32(1) + _u32(duration)
            + struct.pack(">i", edit_media_time)
            + struct.pack(">hh", 1, 0),  # media_rate 1.0
        )
        edts = _box(b"edts", elst)
    moov = _movie_boxes(width, height, timescale, duration, stbl, edts=edts)
    return ftyp + _box(b"mdat", mdat_body) + moov


def _visual_entry(
    width: int,
    height: int,
    codec_config: bytes | None,
    codec_config_type: bytes,
) -> bytes:
    """VisualSampleEntry fixed fields (+ optional decoder-config
    sub-box) — shared by the flat and fragmented muxers."""
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + _u32(0x480000) + _u32(0x480000)  # 72 dpi
        + _u32(0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    if codec_config is not None:
        entry += _box(codec_config_type, codec_config)
    return entry


def encode_mp4_fragmented(
    width: int,
    height: int,
    frames: list[bytes],
    keyframes: list[bool] | None = None,
    timescale: int = 1000,
    sample_delta: int = 40,
    codec: bytes = b"jpeg",
    codec_config: bytes | None = None,
    codec_config_type: bytes = b"avcC",
    ctts_offsets: list[int] | None = None,
    samples_per_fragment: int = 2,
) -> bytes:
    """Fragmented ISO-BMFF (fMP4 — the DASH/CMAF/streaming-capture
    shape crawls actually contain): ``ftyp`` + an init ``moov`` whose
    sample tables are EMPTY (``mvex``/``trex`` carries the track
    defaults) followed by ``moof``+``mdat`` pairs — each ``moof``'s
    ``traf`` holds a ``tfhd`` (default-base-is-moof), a ``tfdt``
    (baseMediaDecodeTime) and one ``trun`` with per-sample sizes,
    per-sample sync flags when ``keyframes`` is given, and composition
    offsets when ``ctts_offsets`` is given (v1 signed when any is
    negative). Small ``samples_per_fragment`` (default 2) forces many
    fragments so the decoder's moof walk, tfdt chaining and
    default-base-is-moof arithmetic are genuinely exercised."""
    if not frames:
        raise ValueError("MP4 needs at least one sample")
    if keyframes is not None and len(keyframes) != len(frames):
        raise ValueError("keyframes mask length != frame count")
    if ctts_offsets is not None and len(ctts_offsets) != len(frames):
        raise ValueError("ctts offsets length != frame count")
    if len(codec) != 4 or len(codec_config_type) != 4:
        raise ValueError("codec sample-entry/config type must be 4 bytes")
    if samples_per_fragment < 1:
        raise ValueError("samples_per_fragment must be >= 1")
    n = len(frames)
    duration = n * sample_delta
    ftyp = _box(
        _FTYP, b"iso6" + _u32(0x200) + b"iso6" + b"isom" + b"mp41"
    )
    entry = _visual_entry(width, height, codec_config, codec_config_type)
    stsd = _full(b"stsd", 0, 0, _u32(1) + _box(codec, entry))
    # empty sample tables: every sample lives in movie fragments
    stbl = _box(
        b"stbl",
        stsd
        + _full(b"stts", 0, 0, _u32(0))
        + _full(b"stsc", 0, 0, _u32(0))
        + _full(b"stsz", 0, 0, _u32(0) + _u32(0))
        + _full(b"stco", 0, 0, _u32(0)),
    )
    # trex: track defaults — duration rides here; default flags mark
    # samples non-sync iff an explicit keyframe mask narrows sync-ness
    default_flags = 0x10000 if keyframes is not None else 0
    trex = _full(
        b"trex", 0, 0,
        _u32(1)  # track_ID
        + _u32(1)  # default_sample_description_index
        + _u32(sample_delta)
        + _u32(0)  # default_sample_size (always per-sample in trun)
        + _u32(default_flags),
    )
    mvex = _box(b"mvex", trex)
    out = bytearray(
        ftyp
        + _movie_boxes(width, height, timescale, duration, stbl, mvex=mvex)
    )

    ctts_v1 = ctts_offsets is not None and any(o < 0 for o in ctts_offsets)
    seq = 0
    for start in range(0, n, samples_per_fragment):
        chunk = frames[start : start + samples_per_fragment]
        seq += 1
        mfhd = _full(b"mfhd", 0, 0, _u32(seq))
        # tfhd: default-base-is-moof (0x20000) + default duration (0x8)
        tfhd = _full(
            b"tfhd", 0, 0x20008, _u32(1) + _u32(sample_delta)
        )
        tfdt = _full(b"tfdt", 0, 0, _u32(start * sample_delta))
        trun_flags = 0x001 | 0x200  # data-offset + sample-size
        if keyframes is not None:
            trun_flags |= 0x400  # per-sample flags
        if ctts_offsets is not None:
            trun_flags |= 0x800  # composition offsets
        rows = b""
        for i, f in enumerate(chunk):
            rows += _u32(len(f))
            if keyframes is not None:
                rows += _u32(0 if keyframes[start + i] else 0x10000)
            if ctts_offsets is not None:
                off = ctts_offsets[start + i]
                rows += struct.pack(">i" if ctts_v1 else ">I", off)

        def _trun(data_offset: int) -> bytes:
            return _full(
                b"trun", 1 if ctts_v1 else 0, trun_flags,
                _u32(len(chunk)) + struct.pack(">i", data_offset) + rows,
            )

        # data_offset is moof-relative (default-base-is-moof): compute
        # with a placeholder — the trun's own length is offset-invariant
        moof_len = len(
            _box(b"moof", mfhd + _box(b"traf", tfhd + tfdt + _trun(0)))
        )
        moof = _box(
            b"moof",
            mfhd + _box(b"traf", tfhd + tfdt + _trun(moof_len + 8)),
        )
        out += moof + _box(b"mdat", b"".join(chunk))
    return bytes(out)


def _boxes(data: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for the sibling boxes in
    ``data[start:end]``. Handles 64-bit ``largesize`` (size == 1) and
    to-end-of-file (size == 0); a torn box raises."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", data[pos : pos + 8])
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"torn MP4 box {btype!r} (size {size})")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("trailing garbage between MP4 boxes")


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full_body(data: bytes, b: int, e: int) -> tuple[int, bytes]:
    if e - b < 4:
        raise ValueError("short full box")
    return data[b], data[b + 4 : e]


def _timescale_of(version: int, body: bytes) -> int:
    """mvhd/mdhd timescale — version-aware: v1 boxes carry 64-bit
    creation/modification times, shifting timescale from body[8:12]
    to body[16:20]. Reading the v0 offset on a v1 box would report
    the low half of modification_time as the timescale."""
    off = 16 if version == 1 else 8
    return struct.unpack(">I", body[off : off + 4])[0]


def decode_mp4(data: bytes) -> dict:
    """MP4 bytes → ``{format, width, height, n_frames, timescale,
    sample_delta, codec, compression, codec_config_type, codec_config,
    keyframes, frames, dts, pts, edit_media_time, presentation_order}``.
    ``frames`` are the raw per-sample payloads in sample order (NO
    pixel decode — sample first, decode later); ``keyframes`` is the
    sorted 0-based sync-sample index list from ``stss`` (every index
    when ``stss`` is absent, per the spec). ``compression`` carries the
    ``stsd`` sample entry type (e.g. ``"jpeg"``) so downstream routes
    payloads exactly like the AVI fourcc. ``codec_config`` is the raw
    body of the sample entry's decoder-configuration sub-box
    (``avcC``/``hvcC``/``esds``/``vpcC``/``av1C``; None when absent) —
    for H.264/H.265 this record is required extradata without which
    the sampled keyframes are undecodable NAL payloads. ``dts``/``pts``
    are per-sample decode / presentation timestamps in media timescale
    units (full ``stts`` expansion; ``ctts`` composition offsets and
    the ``elst`` edit shift applied to pts); ``presentation_order``
    lists sample indices sorted by pts.

    Corruption-normalizing like the Avro reader: a truncated or
    mangled box that would surface as ``struct.error``/``IndexError``
    from the binary unpacks becomes ``ValueError`` naming the defect —
    callers (and executors at 100 TB) see ONE failure mode.
    ``MemoryError``/``OverflowError`` are normalized too as defense in
    depth, though every table count is bounds-checked before any
    allocation."""
    try:
        return _decode_mp4(data)
    except (struct.error, IndexError, MemoryError, OverflowError) as e:
        raise ValueError(
            f"corrupt ISO-BMFF container: {type(e).__name__}: {e}"
        ) from e


def _check_count(name: bytes, n: int, entry_bytes: int, body: bytes,
                 payload_off: int = 4) -> None:
    """A table's declared entry count must fit inside its own box body
    — validated BEFORE materializing anything, so a corrupted count
    (e.g. 0xFFFFFFFF) raises instead of allocating gigabytes."""
    if payload_off + entry_bytes * n > len(body):
        raise ValueError(
            f"{name.decode('latin-1')} declares {n} entries but its box "
            f"body holds {len(body) - payload_off} bytes"
        )


# stsd sample-entry sub-boxes that carry the decoder-configuration
# record (published extradata formats: 14496-15 avcC/hvcC, 14496-1
# esds, the VP9/AV1 codec-ISO bindings' vpcC/av1C).
_CONFIG_BOXES = (b"avcC", b"hvcC", b"esds", b"vpcC", b"av1C")
# VisualSampleEntry fixed fields AFTER the 8-byte box header
# (14496-12 §12.1.3): 8 SampleEntry + 16 pre_defined/reserved +
# 4 dims + 8 resolution + 4 reserved + 2 frame_count +
# 32 compressorname + 4 depth/pre_defined = 78; the decoder's
# `entry` slice already excludes the header, so sub-boxes start here.
_VISUAL_ENTRY_FIXED = 78


def _first_edit_media_time(version: int, body: bytes) -> int:
    """elst → the media_time of the first NORMAL edit (media_time
    != -1; -1 is an empty edit inserting blank presentation time).
    Presentation timestamps shift down by this value — the standard
    use is trimming the leading B-frame composition delay."""
    (k,) = struct.unpack(">I", body[:4])
    step = 20 if version == 1 else 12
    _check_count(b"elst", k, step, body)
    for i in range(k):
        off = 4 + step * i
        if version == 1:
            media_time = struct.unpack(">q", body[off + 8 : off + 16])[0]
        else:
            media_time = struct.unpack(">i", body[off + 4 : off + 8])[0]
        if media_time != -1:
            return media_time
    return 0


def _decode_fragments(
    data: bytes, track_id: int, trex_map: dict[int, tuple]
):
    """Walk top-level ``moof`` boxes and materialize the video track's
    samples: ``(frames, dts, composition_offsets, sync_indices,
    first_duration)``. Implements tfhd base-data-offset /
    default-base-is-moof, tfdt decode-time anchoring (chained when
    absent), trun per-sample size/duration/flags/composition rows with
    tfhd→trex default fallback, and first-sample-flags. Sync-ness is
    the sample_is_non_sync_sample flag (bit 16) — clear means sync.
    Every trun row count is validated against its box body before any
    loop (the stsz-bomb rule)."""
    frames: list[bytes] = []
    dts: list[int] = []
    comp: list[int] = []
    sync: list[int] = []
    first_dur = None
    next_dts = 0
    for t, b, e in _boxes(data, 0, len(data)):
        if t != b"moof":
            continue
        if b < 8 or data[b - 4 : b] != b"moof":
            raise ValueError("largesize moof headers are not supported")
        moof_start = b - 8
        for tt, tb, te in _boxes(data, b, e):
            if tt != b"traf":
                continue
            th = _find(data, tb, te, b"tfhd")
            if th is None:
                raise ValueError("traf missing tfhd")
            _v, body = _full_body(data, th[0], th[1])
            tf_flags = int.from_bytes(data[th[0] + 1 : th[0] + 4], "big")
            (tid,) = struct.unpack(">I", body[:4])
            pos = 4
            base = moof_start  # default-base-is-moof / first-traf rule
            if tf_flags & 0x1:
                base = struct.unpack(">Q", body[pos : pos + 8])[0]
                pos += 8
            if tf_flags & 0x2:
                pos += 4  # sample_description_index (single stsd entry)
            d_dur = d_size = d_flags = None
            if tf_flags & 0x8:
                (d_dur,) = struct.unpack(">I", body[pos : pos + 4])
                pos += 4
            if tf_flags & 0x10:
                (d_size,) = struct.unpack(">I", body[pos : pos + 4])
                pos += 4
            if tf_flags & 0x20:
                (d_flags,) = struct.unpack(">I", body[pos : pos + 4])
                pos += 4
            if tid != track_id:
                continue
            tdd, tds, tdf = trex_map.get(tid, (None, None, None))
            if d_dur is None:
                d_dur = tdd
            if d_size is None:
                d_size = tds
            if d_flags is None:
                d_flags = tdf
            cur = next_dts
            td = _find(data, tb, te, b"tfdt")
            if td is not None:
                tv, tbody = _full_body(data, td[0], td[1])
                cur = (
                    struct.unpack(">Q", tbody[:8])[0]
                    if tv == 1
                    else struct.unpack(">I", tbody[:4])[0]
                )
            data_pos = None
            for rt, rb, re_ in _boxes(data, tb, te):
                if rt != b"trun":
                    continue
                rv, rbody = _full_body(data, rb, re_)
                r_flags = int.from_bytes(data[rb + 1 : rb + 4], "big")
                (count,) = struct.unpack(">I", rbody[:4])
                p = 4
                row_bytes = sum(
                    4 for bit in (0x100, 0x200, 0x400, 0x800)
                    if r_flags & bit
                )
                head_bytes = (4 if r_flags & 0x1 else 0) + (
                    4 if r_flags & 0x4 else 0
                )
                if 4 + head_bytes + row_bytes * count > len(rbody):
                    raise ValueError(
                        f"trun declares {count} samples but its box "
                        f"body holds {len(rbody)} bytes"
                    )
                if row_bytes == 0 and count > len(data):
                    # all-default rows: bound the count by the file —
                    # zero-size default samples would otherwise
                    # materialize billions of empty frames
                    raise ValueError(
                        "trun sample count exceeds the file size"
                    )
                if r_flags & 0x1:
                    (doff,) = struct.unpack(">i", rbody[p : p + 4])
                    p += 4
                    data_pos = base + doff
                elif data_pos is None:
                    raise ValueError(
                        "first trun of a traf carries no data offset"
                    )
                first_flags = None
                if r_flags & 0x4:
                    (first_flags,) = struct.unpack(">I", rbody[p : p + 4])
                    p += 4
                # bulk-unpack the fixed-size sample rows: one
                # iter_unpack instead of up to four struct calls per
                # sample — the difference between the fragment walk
                # costing ~the flat chunk walk and costing 4x
                fmt = ">"
                if r_flags & 0x100:
                    fmt += "I"  # duration
                if r_flags & 0x200:
                    fmt += "I"  # size
                if r_flags & 0x400:
                    fmt += "I"  # flags
                if r_flags & 0x800:
                    fmt += "i" if rv else "I"  # composition offset
                if row_bytes:
                    rows_iter = struct.iter_unpack(
                        fmt, rbody[p : p + row_bytes * count]
                    )
                else:
                    rows_iter = iter(() for _ in range(count))
                for i, row in enumerate(rows_iter):
                    dur, size, sfl, coff = d_dur, d_size, d_flags, 0
                    ri = 0
                    if r_flags & 0x100:
                        dur = row[ri]
                        ri += 1
                    if r_flags & 0x200:
                        size = row[ri]
                        ri += 1
                    if r_flags & 0x400:
                        sfl = row[ri]
                        ri += 1
                    if r_flags & 0x800:
                        coff = row[ri]
                    if i == 0 and first_flags is not None and not (
                        r_flags & 0x400
                    ):
                        sfl = first_flags
                    if not size:
                        raise ValueError(
                            "fMP4 sample has no size (trun row, tfhd "
                            "and trex all silent)"
                        )
                    if dur is None:
                        dur = 0
                    if first_dur is None and dur:
                        first_dur = dur
                    end = data_pos + size
                    if data_pos < 0 or end > len(data):
                        # negative positions would otherwise slice
                        # from the END of the file (Python negative
                        # indexing) — silently wrong bytes, not loud
                        raise ValueError(
                            "fMP4 sample range outside the file"
                        )
                    frames.append(data[data_pos:end])
                    data_pos = end
                    if sfl is None or not (sfl & 0x10000):
                        sync.append(len(frames) - 1)
                    dts.append(cur)
                    cur += dur
                    comp.append(coff)
            next_dts = cur
    return frames, dts, comp, sync, first_dur


def _decode_mp4(data: bytes) -> dict:
    if len(data) < 12 or data[4:8] != _FTYP:
        raise ValueError("not an ISO-BMFF file (no ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov")
    timescale = None
    mv = _find(data, moov[0], moov[1], b"mvhd")
    if mv is not None:
        _v, body = _full_body(data, mv[0], mv[1])
        timescale = _timescale_of(_v, body)
    # first video trak
    stbl = None
    edit_media_time = 0
    track_id = 1
    for t, b, e in _boxes(data, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = _find(data, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _v, hbody = _full_body(data, hdlr[0], hdlr[1])
        if hbody[4:8] != b"vide":
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        if mdhd is not None:
            _v, mbody = _full_body(data, mdhd[0], mdhd[1])
            timescale = _timescale_of(_v, mbody)
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is not None:
            tk = _find(data, b, e, b"tkhd")
            if tk is not None:
                tv, tbody = _full_body(data, tk[0], tk[1])
                off = 16 if tv == 1 else 8  # v1: 64-bit times first
                track_id = struct.unpack(">I", tbody[off : off + 4])[0]
            edts = _find(data, b, e, b"edts")
            if edts is not None:
                el = _find(data, edts[0], edts[1], b"elst")
                if el is not None:
                    ev, ebody = _full_body(data, el[0], el[1])
                    edit_media_time = _first_edit_media_time(ev, ebody)
            break
    if stbl is None:
        raise ValueError("MP4 has no video track with a sample table")
    # mvex/trex: per-track defaults for movie fragments
    trex_map: dict[int, tuple] = {}
    mvex = _find(data, moov[0], moov[1], b"mvex")
    if mvex is not None:
        for t, b, e in _boxes(data, mvex[0], mvex[1]):
            if t == b"trex":
                _v, body = _full_body(data, b, e)
                tid, _sdi, dd, ds, df = struct.unpack(">IIIII", body[:20])
                trex_map[tid] = (dd or None, ds or None, df)

    codec = None
    width = height = None
    sample_delta = None
    codec_config = None
    codec_config_type = None
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_runs: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    stts_runs: list[tuple[int, int]] = []  # (sample_count, delta)
    ctts_runs: list[tuple[int, int]] = []  # (sample_count, offset)
    sync: list[int] | None = None
    known = {
        b"stsd", b"stts", b"ctts", b"stss", b"stsz", b"stsc",
        b"stco", b"co64",
    }
    for t, b, e in _boxes(data, stbl[0], stbl[1]):
        if t not in known:
            continue  # free/skip fillers and boxes we don't consume
        _v, body = _full_body(data, b, e)
        if t == b"stsd":
            (n_entries,) = struct.unpack(">I", body[:4])
            if n_entries < 1:
                raise ValueError("empty stsd")
            esize, etype = struct.unpack(">I4s", body[4:12])
            codec = etype.decode("latin-1")
            if 4 + esize > len(body) or esize < 8:
                raise ValueError("stsd sample entry overruns its box")
            entry = body[12 : 4 + esize]
            if len(entry) >= 28:  # VisualSampleEntry dims
                width, height = struct.unpack(">HH", entry[24:28])
            # decoder-configuration sub-boxes follow the fixed fields.
            # BEST-EFFORT (review r16): real muxers pad the sample
            # entry tail with non-box bytes; config is optional
            # metadata, so a malformed tail stops the scan instead of
            # failing a decode that worked before the scan existed.
            if len(entry) > _VISUAL_ENTRY_FIXED:
                try:
                    for st, sb, se in _boxes(
                        entry, _VISUAL_ENTRY_FIXED, len(entry)
                    ):
                        if st in _CONFIG_BOXES and codec_config is None:
                            codec_config_type = st.decode("latin-1")
                            codec_config = entry[sb:se]
                except ValueError:
                    pass  # padding / vendor bytes, not sub-boxes
        elif t == b"stts":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 8, body)
            if k >= 1:
                sample_delta = struct.unpack(">I", body[8:12])[0]
            for i in range(k):
                cnt, delta = struct.unpack(">II", body[4 + 8 * i : 12 + 8 * i])
                stts_runs.append((cnt, delta))
        elif t == b"ctts":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 8, body)
            fmt = ">Ii" if _v == 1 else ">II"  # v1: signed offsets
            for i in range(k):
                cnt, off = struct.unpack(fmt, body[4 + 8 * i : 12 + 8 * i])
                ctts_runs.append((cnt, off))
        elif t == b"stss":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 4, body)
            sync = [
                struct.unpack(">I", body[4 + 4 * i : 8 + 4 * i])[0] - 1
                for i in range(k)
            ]
        elif t == b"stsz":
            fixed, count = struct.unpack(">II", body[:8])
            if fixed:
                # fixed-size branch: the count is not backed by table
                # entries, so bound it by the file itself — count
                # samples of `fixed` bytes can never exceed the mdat
                # (ADVICE r15: count=0xFFFFFFFF would allocate ~32 GB)
                if fixed * count > len(data):
                    raise ValueError(
                        f"stsz declares {count} samples of {fixed} bytes"
                        f" — more than the whole file ({len(data)})"
                    )
                sizes = [fixed] * count
            else:
                _check_count(t, count, 4, body, payload_off=8)
                sizes = [
                    struct.unpack(">I", body[8 + 4 * i : 12 + 4 * i])[0]
                    for i in range(count)
                ]
        elif t == b"stsc":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 12, body)
            for i in range(k):
                fc, spc, _sdi = struct.unpack(
                    ">III", body[4 + 12 * i : 16 + 12 * i]
                )
                stsc_runs.append((fc, spc))
        elif t == b"stco":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 4, body)
            chunk_offsets = [
                struct.unpack(">I", body[4 + 4 * i : 8 + 4 * i])[0]
                for i in range(k)
            ]
        elif t == b"co64":
            (k,) = struct.unpack(">I", body[:4])
            _check_count(t, k, 8, body)
            chunk_offsets = [
                struct.unpack(">Q", body[4 + 8 * i : 12 + 8 * i])[0]
                for i in range(k)
            ]
    if not sizes and not chunk_offsets and not stsc_runs and not stts_runs:
        # empty sample tables: a fragmented-MP4 init segment — every
        # sample lives in moof+mdat movie fragments (DASH/CMAF)
        frames, dts, comp, fsync, first_dur = _decode_fragments(
            data, track_id, trex_map
        )
        if not frames:
            raise ValueError(
                "fragmented MP4 has no samples for the video track"
            )
        n = len(frames)
        if sample_delta is None:
            sample_delta = first_dur
        pts = [dts[i] + comp[i] - edit_media_time for i in range(n)]
        return {
            "format": "mp4",
            "width": width,
            "height": height,
            "n_frames": n,
            "timescale": timescale,
            "sample_delta": sample_delta,
            "codec": codec,
            "compression": codec,
            "codec_config_type": codec_config_type,
            "codec_config": codec_config,
            "keyframes": fsync,
            "frames": frames,
            "dts": dts,
            "pts": pts,
            "edit_media_time": edit_media_time,
            "presentation_order": sorted(
                range(n), key=lambda i: (pts[i], i)
            ),
            "fragmented": True,
        }
    if not sizes or not chunk_offsets or not stsc_runs:
        raise ValueError("MP4 sample table incomplete (stsz/stco/stsc)")

    # expand the stsc runs: samples-per-chunk for each chunk index.
    # Run starts must be in-range and strictly increasing BEFORE the
    # extend — a corrupted first_chunk would otherwise materialize a
    # multi-GB list (same attack class as the stsz fixed count).
    spc_by_chunk: list[int] = []
    for ri, (fc, spc) in enumerate(stsc_runs):
        last = (
            stsc_runs[ri + 1][0] - 1
            if ri + 1 < len(stsc_runs)
            else len(chunk_offsets)
        )
        if fc < 1 or last > len(chunk_offsets) or last < fc - 1:
            raise ValueError("stsc chunk runs out of range or unordered")
        spc_by_chunk.extend([spc] * (last - fc + 1))
    if len(spc_by_chunk) != len(chunk_offsets):
        raise ValueError("stsc chunk runs disagree with stco chunk count")

    frames: list[bytes] = []
    si = 0
    for ci, off in enumerate(chunk_offsets):
        pos = off
        for _ in range(spc_by_chunk[ci]):
            if si >= len(sizes):
                break
            end = pos + sizes[si]
            if end > len(data):
                raise ValueError("MP4 sample range beyond end of file")
            frames.append(data[pos:end])
            pos = end
            si += 1
    if si != len(sizes):
        raise ValueError(
            f"MP4 chunk layout yields {si} samples, stsz declares {len(sizes)}"
        )
    n = len(frames)
    keyframes = sorted(sync) if sync is not None else list(range(n))
    if any(k < 0 or k >= n for k in keyframes):
        raise ValueError("stss references a sample outside the track")

    # full stts expansion → decode timestamps; ctts + elst → pts.
    # Run totals are capped by the (already validated) sample count
    # before extending, so a corrupted run count cannot allocate.
    dts: list[int] = []
    tick = 0
    for cnt, delta in stts_runs:
        if len(dts) + cnt > n:
            raise ValueError("stts run counts exceed the sample count")
        for _ in range(cnt):
            dts.append(tick)
            tick += delta
    if stts_runs and len(dts) != n:
        raise ValueError(
            f"stts covers {len(dts)} samples, track has {n}"
        )
    if not dts:
        dts = [0] * n  # stts absent: degenerate but non-crashing
    comp: list[int] = []
    for cnt, off in ctts_runs:
        if len(comp) + cnt > n:
            raise ValueError("ctts run counts exceed the sample count")
        comp.extend([off] * cnt)
    if ctts_runs and len(comp) != n:
        raise ValueError(
            f"ctts covers {len(comp)} samples, track has {n}"
        )
    if not comp:
        comp = [0] * n

    # hybrid file (review r16): a populated moov PLUS moof fragments —
    # the smooth-streaming/live-archive capture shape. Fragment
    # samples APPEND after the moov samples (tfdt anchors their decode
    # times on the same media timeline); dropping them silently would
    # truncate the track with no error.
    f_frames, f_dts, f_comp, f_sync, f_dur = _decode_fragments(
        data, track_id, trex_map
    )
    fragmented = bool(f_frames)
    if fragmented:
        keyframes = keyframes + [n + i for i in f_sync]
        frames += f_frames
        dts += f_dts
        comp += f_comp
        n = len(frames)
        if sample_delta is None:
            sample_delta = f_dur

    pts = [dts[i] + comp[i] - edit_media_time for i in range(n)]
    presentation_order = sorted(range(n), key=lambda i: (pts[i], i))

    return {
        "format": "mp4",
        "width": width,
        "height": height,
        "n_frames": n,
        "timescale": timescale,
        "sample_delta": sample_delta,
        "codec": codec,
        "compression": codec,  # routes downstream like the AVI fourcc
        "codec_config_type": codec_config_type,
        "codec_config": codec_config,
        "keyframes": keyframes,
        "frames": frames,
        "dts": dts,
        "pts": pts,
        "edit_media_time": edit_media_time,
        "presentation_order": presentation_order,
        "fragmented": fragmented,
    }
