"""AVI/Motion-JPEG container codec (functions/video.py) — round-trips,
corruption guards, RIFF dispatch separation from WAV, and the Spark-side
keyframe sampling plumbing (operators/multimodal.py)."""

import struct

import pytest

from blockchaintoavro_spark.functions.audio import encode_wav, try_decode_audio
from blockchaintoavro_spark.functions.video import (
    decode_avi,
    encode_avi,
    try_decode_video,
)


def _clip(n_frames=3, w=16, h=8, doc_id=5):
    from blockchaintoavro_spark.functions.jpeg import encode_jpeg

    frames = [
        encode_jpeg(
            w, h,
            bytes(
                (doc_id * 19 + (x // 8) * 29 + 7 * k) % 256
                for y in range(h)
                for x in range(w)
            ),
            1, quant=1,
        )
        for k in range(n_frames)
    ]
    return frames, encode_avi(w, h, frames, usec_per_frame=33333)


def test_avi_roundtrip_preserves_frames_and_header():
    frames, avi = _clip()
    d = decode_avi(avi)
    assert (d["width"], d["height"], d["n_frames"]) == (16, 8, 3)
    assert d["usec_per_frame"] == 33333
    assert d["frames"] == frames


def test_avi_frames_decode_to_exact_pixels():
    """MJPEG leg: each extracted frame payload is a real JFIF that
    decodes to the synthesized pixels exactly (flat-block losslessness)."""
    from blockchaintoavro_spark.functions.imaging import try_decode_image

    frames, avi = _clip()
    for k, f in enumerate(decode_avi(avi)["frames"]):
        info = try_decode_image(f)
        expected = bytes(
            (5 * 19 + (x // 8) * 29 + 7 * k) % 256
            for y in range(8)
            for x in range(16)
        )
        assert info["pixels"] == expected


def test_avi_riff_dispatch_is_disjoint_from_wav():
    _, avi = _clip()
    wav = encode_wav(8000, 1, [1, -1, 2, -2])
    assert try_decode_audio(avi) is None
    assert try_decode_video(wav) is None
    assert try_decode_video(avi)["format"] == "avi"
    assert try_decode_audio(wav)["format"] == "wav"


def test_avi_corruption_raises():
    _, avi = _clip()
    with pytest.raises(ValueError):
        decode_avi(avi[:40])  # truncated inside hdrl
    with pytest.raises(ValueError):
        decode_avi(b"RIFF" + avi[4:8] + b"JUNK" + avi[12:])  # bad form type
    # header/movi frame-count mismatch must be loud (silently dropped
    # frames are the failure mode an idx1-trusting reader would hide)
    mangled = avi.replace(struct.pack("<I", 3), struct.pack("<I", 9), 1)
    with pytest.raises(ValueError, match="frame count"):
        decode_avi(mangled)


def test_avi_needs_at_least_one_frame():
    with pytest.raises(ValueError):
        encode_avi(8, 8, [])


def test_avi_dims_beyond_16bit_survive():
    """True dims live in the 32-bit avih fields; the 16-bit advisory
    rcFrame/biSizeImage clamp instead of failing the pack."""
    d = decode_avi(encode_avi(100_000, 70_000, [b"frame"]))
    assert (d["width"], d["height"]) == (100_000, 70_000)
    assert d["frames"] == [b"frame"]


def test_sample_frames_avi_branch(spark):
    """Spark plumbing: AVI payloads get real keyframe extraction — every
    2nd frame payload kept as self-describing JPEG bytes, no pixel decode
    for dropped frames; non-AVI payloads keep the byte-window fallback."""
    from blockchaintoavro_spark.functions.imaging import try_decode_image
    from blockchaintoavro_spark.operators.multimodal import sample_frames

    frames, avi = _clip(n_frames=4)
    rows = [(0, bytearray(avi)), (1, b"0123456789abcdef" * 2)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sample_frames(df, frame_bytes=16, every_n=2).collect()
    avi_rows = sorted(
        (r["frame_no"], bytes(r["frame"])) for r in got if r["doc_id"] == 0
    )
    assert [no for no, _ in avi_rows] == [0, 2]
    assert [f for _, f in avi_rows] == [frames[0], frames[2]]
    assert all(try_decode_image(f) is not None for _, f in avi_rows)
    fallback = [r for r in got if r["doc_id"] == 1]
    assert [r["frame_no"] for r in fallback] == [0]  # 32 bytes → frames 0 (every 2nd)


def test_avi_raw_dib_roundtrip_and_metadata():
    """DIB (BI_RGB) AVI: raw frames travel 00db chunks, strh fourcc and
    strf biCompression/biBitCount surface through decode, and
    dib_to_pixels unpacks bottom-up padded BGR rows to top-down RGB."""
    from blockchaintoavro_spark.functions.video import (
        decode_avi,
        dib_to_pixels,
        encode_avi,
    )

    w, h = 3, 2  # stride 12 (w*3=9 -> 3 pad bytes): padding load-bearing
    # RGB top-down target: pixel (x,y) -> (x, y, x+y)
    rgb = bytes(v for y in range(h) for x in range(w) for v in (x, y, x + y))
    stride = (w * 3 + 3) & ~3
    dib = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            dib += bytes([x + y, y, x])  # BGR
        dib += b"\x00" * (stride - w * 3)
    frames = [bytes(dib), bytes(dib)]
    d = decode_avi(encode_avi(w, h, frames, fourcc=b"DIB "))
    assert d["fourcc"] == "DIB "
    assert d["compression"] == "raw"
    assert d["bit_count"] == 24
    assert d["frames"] == frames
    got = dib_to_pixels(d["frames"][0], w, h, d["bit_count"])
    assert got["pixels"] == rgb
    assert (got["width"], got["height"], got["channels"]) == (w, h, 3)


def test_avi_mjpg_metadata_surfaces():
    from blockchaintoavro_spark.functions.video import decode_avi, encode_avi

    d = decode_avi(encode_avi(8, 8, [b"frame"]))
    assert d["fourcc"] == "MJPG"
    assert d["compression"] == "MJPG"
    assert d["bit_count"] == 24


def test_dib_to_pixels_rejects_bad_input():
    from blockchaintoavro_spark.functions.video import dib_to_pixels

    with pytest.raises(ValueError, match="bit depth"):
        dib_to_pixels(b"\x00" * 64, 2, 2, bit_count=8)
    with pytest.raises(ValueError, match="short DIB"):
        dib_to_pixels(b"\x00" * 4, 4, 4)


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF (VERDICT r14 #4)


def test_mp4_roundtrip_samples_header_and_keyframes():
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    frames = [bytes([i] * (50 + i * 7)) for i in range(5)]
    mask = [k % 3 == 0 for k in range(5)]
    d = decode_mp4(encode_mp4(24, 16, frames, keyframes=mask))
    assert d["format"] == "mp4" and d["codec"] == "jpeg"
    assert (d["width"], d["height"], d["n_frames"]) == (24, 16, 5)
    assert (d["timescale"], d["sample_delta"]) == (1000, 40)
    assert d["frames"] == frames  # byte-identical through stsc/stco/stsz
    assert d["keyframes"] == [0, 3]  # stss, 0-based


def test_mp4_absent_stss_means_all_keyframes():
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    frames = [b"a", b"bb", b"ccc"]
    d = decode_mp4(encode_mp4(4, 4, frames))  # keyframes=None → no stss
    assert d["keyframes"] == [0, 1, 2]
    assert d["frames"] == frames


def test_mp4_chunk_runs_cover_odd_and_even_counts():
    """Two-samples-per-chunk layout with a trailing single: the
    stsc run expansion must reproduce every count exactly."""
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    for n in (1, 2, 3, 4, 7, 10):
        frames = [bytes([j]) * (j + 1) for j in range(n)]
        d = decode_mp4(encode_mp4(2, 2, frames))
        assert d["frames"] == frames, n


def test_mp4_corruption_raises():
    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"xy", b"zw"], keyframes=[True, False])
    with _pytest.raises(ValueError, match="ftyp"):
        decode_mp4(b"\x00" * 32)
    # torn box: truncate mid-moov
    with _pytest.raises(ValueError):
        decode_mp4(good[:-9])
    # stss pointing outside the track
    import struct as _struct

    bad = bytearray(good)
    idx = bad.find(b"stss")
    (k,) = _struct.unpack(">I", bad[idx + 8 : idx + 12])
    bad[idx + 12 : idx + 16] = _struct.pack(">I", 99)  # sample 99 of 2
    with _pytest.raises(ValueError, match="stss"):
        decode_mp4(bytes(bad))


def test_try_decode_video_dispatches_mp4_and_avi_disjointly():
    from blockchaintoavro_spark.functions.mp4 import encode_mp4
    from blockchaintoavro_spark.functions.video import (
        encode_avi,
        try_decode_video,
    )

    m = try_decode_video(encode_mp4(4, 4, [b"x"]))
    assert m is not None and m["format"] == "mp4"
    a = try_decode_video(encode_avi(4, 4, [b"x"]))
    assert a is not None and a["format"] == "avi"
    assert try_decode_video(b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 8) is None


def test_video_phash_codes_accepts_mp4_and_samples_keyframes(spark):
    """The generic video-phash leg over an MJPEG-in-MP4 payload: only
    the stss keyframes are decoded (sample first), and each code equals
    the still-image phash of the same frame."""
    from blockchaintoavro_spark.functions.imaging import try_decode_image
    from blockchaintoavro_spark.functions.jpeg import encode_jpeg
    from blockchaintoavro_spark.functions.mp4 import encode_mp4
    from blockchaintoavro_spark.operators.phash import (
        phash63,
        video_phash_codes,
    )

    w = h = 16
    jpegs = [
        encode_jpeg(
            w, h,
            bytes(
                (37 * (x // 8) + 53 * (y // 8) + 29 * k) % 256
                for y in range(h)
                for x in range(w)
            ),
            1, quant=1,
        )
        for k in range(6)
    ]
    mask = [k % 2 == 0 for k in range(6)]
    payload = encode_mp4(w, h, jpegs, keyframes=mask)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    got = {
        r["frame_no"]: r["phash"]
        for r in video_phash_codes(df).collect()
    }
    assert sorted(got) == [0, 2, 4]  # keyframes only — never 1/3/5
    for k in (0, 2, 4):
        d = try_decode_image(jpegs[k])
        assert got[k] == phash63(
            d["pixels"], d["width"], d["height"], d["channels"]
        )


def test_mp4_corrupt_sample_tables_normalize_to_valueerror():
    """Review r15: truncated/overflowing sample-table boxes must surface
    as ValueError (the module contract callers catch), never raw
    struct.error escaping an Arrow worker."""
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"xy", b"zw"], keyframes=[True, False])
    for fourcc in (b"stsz", b"stss", b"stsc", b"stco"):
        bad = bytearray(good)
        idx = good.find(fourcc)
        # declared count far beyond the actual body
        bad[idx + 8 : idx + 12] = _struct.pack(">I", 999)
        with _pytest.raises(ValueError):
            decode_mp4(bytes(bad))


def test_mp4_tolerates_free_filler_box_in_stbl():
    """Review r15: a legal zero-body 'free' filler inside stbl (real
    muxers emit them for in-place edits) must be skipped, not parsed as
    a full box."""
    import struct as _struct

    from blockchaintoavro_spark.functions.mp4 import (
        _box,
        decode_mp4,
        encode_mp4,
    )

    frames = [b"ab", b"cde", b"f"]
    good = encode_mp4(4, 4, frames, keyframes=[True, False, True])
    stbl_at = good.find(b"stbl")
    free = _box(b"free", b"")
    patched = bytearray(
        good[: stbl_at + 4] + free + good[stbl_at + 4 :]
    )
    # grow every enclosing box's declared size by len(free)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = bytes(patched).find(name)
        (sz,) = _struct.unpack(">I", patched[at - 4 : at])
        patched[at - 4 : at] = _struct.pack(">I", sz + len(free))
    d = decode_mp4(bytes(patched))
    assert d["frames"] == frames
    assert d["keyframes"] == [0, 2]


def test_mp4_timescale_is_version_aware():
    """Review r15: a v1 mvhd/mdhd carries 64-bit times, shifting
    timescale from body[8:12] to body[16:20] — the v0 offset on a v1
    box would report modification-time bits as the timescale."""
    import struct as _struct

    from blockchaintoavro_spark.functions.mp4 import _timescale_of

    v0 = b"\x00" * 8 + _struct.pack(">I", 555) + b"\x00" * 8
    assert _timescale_of(0, v0) == 555
    v1 = b"\x00" * 16 + _struct.pack(">I", 777) + b"\x00" * 8
    assert _timescale_of(1, v1) == 777


def test_sample_frames_mp4_branch_keeps_sync_samples_only(spark):
    from blockchaintoavro_spark.functions.mp4 import encode_mp4
    from blockchaintoavro_spark.operators.multimodal import sample_frames

    frames = [b"frame-%d" % k for k in range(8)]
    mask = [k % 4 == 0 for k in range(8)]  # sync samples 0 and 4
    payload = encode_mp4(4, 4, frames, keyframes=mask)
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    got = {
        r["frame_no"]: bytes(r["frame"])
        for r in sample_frames(df, every_n=1).collect()
    }
    # only the declared sync samples, carrying their TRUE sample index
    assert got == {0: b"frame-0", 4: b"frame-4"}
    # every_n strides the keyframe list, not the raw frame range
    got2 = sorted(
        r["frame_no"] for r in sample_frames(df, every_n=2).collect()
    )
    assert got2 == [0]


# ---------------------------------------------------------------------------
# MP4 decoder configuration + presentation order (VERDICT r15 #1/#8)


def test_mp4_codec_config_roundtrips_byte_exact():
    """An avc1 sample entry with an avcC decoder-configuration sub-box:
    the blob must round-trip byte-exactly through mux + box walk — for
    H.264 the sampled keyframes are undecodable NAL payloads without
    it. Sampling still decodes zero pixels (payloads are opaque)."""
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    avcc = bytes(
        [1, 0x64, 0x00, 0x1F, 0xFF, 0xE1, 0x00, 0x05]
    ) + b"\x67\x64\x00\x1f\xac" + b"\x01\x00\x04\x68\xee\x3c\x80"
    nals = [b"\x00\x00\x01\x65" + bytes([k]) * 9 for k in range(4)]
    d = decode_mp4(
        encode_mp4(
            640, 360, nals,
            keyframes=[True, False, False, True],
            codec=b"avc1",
            codec_config=avcc,
        )
    )
    assert d["codec"] == "avc1"
    assert d["codec_config_type"] == "avcC"
    assert d["codec_config"] == avcc  # byte-exact
    assert d["frames"] == nals  # raw payloads, no decode attempted
    assert d["keyframes"] == [0, 3]


def test_mp4_without_config_box_reports_none():
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    d = decode_mp4(encode_mp4(4, 4, [b"x", b"y"]))
    assert d["codec_config"] is None and d["codec_config_type"] is None


def test_mp4_foreign_sample_entry_subbox_is_skipped():
    """A non-config sub-box (e.g. pasp pixel-aspect) in the sample
    entry must be walked over without being mistaken for extradata."""
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    d = decode_mp4(
        encode_mp4(
            8, 8, [b"q"],
            codec_config=b"\x00\x00\x00\x01\x00\x00\x00\x01",
            codec_config_type=b"pasp",
        )
    )
    assert d["codec_config"] is None and d["codec_config_type"] is None


def test_mp4_stsz_fixed_count_bomb_raises_valueerror():
    """ADVICE r15 (high): a corrupted fixed-size stsz count
    (0xFFFFFFFF) must raise ValueError BEFORE materializing the sizes
    list — not allocate ~32 GB and OOM-kill the executor."""
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"xy"])
    bad = bytearray(good)
    idx = good.find(b"stsz")
    # body: ver/flags(4) fixed(4) count(4) [entries...]
    bad[idx + 8 : idx + 12] = _struct.pack(">I", 1000)  # fixed size
    bad[idx + 12 : idx + 16] = _struct.pack(">I", 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="stsz"):
        decode_mp4(bytes(bad))


def test_mp4_stsc_run_bomb_raises_valueerror():
    """Same attack class via stsc: a first_chunk of ~4B would extend a
    multi-GB samples-per-chunk list if runs weren't range-checked."""
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"ab", b"cd", b"ef", b"gh", b"ij"])
    bad = bytearray(good)
    idx = good.find(b"stsc")
    # two runs: patch the SECOND run's first_chunk to 0xFFFFFFF0
    bad[idx + 24 : idx + 28] = _struct.pack(">I", 0xFFFFFFF0)
    with _pytest.raises(ValueError, match="stsc"):
        decode_mp4(bytes(bad))


def test_mp4_ctts_gives_presentation_order():
    """Non-trivial ctts (B-frame-shaped reorder): dts stays monotone in
    decode order, pts carries the composition offsets, and
    presentation_order re-sorts the samples."""
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    frames = [b"I0", b"P3", b"B1", b"B2"]
    # decode order I P B B; presentation I B B P (classic GOP)
    offsets = [0, 80, -40, -40]
    d = decode_mp4(
        encode_mp4(4, 4, frames, sample_delta=40, ctts_offsets=offsets)
    )
    assert d["dts"] == [0, 40, 80, 120]
    assert d["pts"] == [0, 120, 40, 80]
    assert d["presentation_order"] == [0, 2, 3, 1]
    assert d["frames"] == frames  # sample order untouched


def test_mp4_ctts_v0_unsigned_offsets():
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    d = decode_mp4(
        encode_mp4(4, 4, [b"a", b"b"], sample_delta=10,
                   ctts_offsets=[20, 0])
    )
    assert d["pts"] == [20, 10]
    assert d["presentation_order"] == [1, 0]


def test_mp4_elst_shifts_presentation_times():
    """An edit list trimming the leading composition delay: pts shift
    down by media_time, dts untouched."""
    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    d = decode_mp4(
        encode_mp4(
            4, 4, [b"a", b"b", b"c"], sample_delta=40,
            ctts_offsets=[40, 120, 0], edit_media_time=40,
        )
    )
    assert d["edit_media_time"] == 40
    assert d["dts"] == [0, 40, 80]
    assert d["pts"] == [0, 120, 40]  # (dts+ctts) - 40


def test_mp4_stts_multi_run_expansion():
    """stts with two runs (variable frame duration): dts must follow
    the full run expansion, not just the first delta."""
    import struct as _struct

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"a", b"b", b"c"], sample_delta=40)
    # rewrite the single-run stts (1 run, 3×40) as 2 runs: 2×40, 1×100
    idx = good.find(b"stts")
    # full box: size(4) type(4) ver/flags(4) n(4) count(4) delta(4)
    old = good[idx - 4 : idx + 20]
    new_body = (
        b"\x00\x00\x00\x00"  # ver/flags
        + _struct.pack(">I", 2)
        + _struct.pack(">II", 2, 40)
        + _struct.pack(">II", 1, 100)
    )
    new = _struct.pack(">I", 8 + len(new_body)) + b"stts" + new_body
    grown = len(new) - len(old)
    patched = bytearray(good.replace(old, new))
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = bytes(patched).find(name)
        (sz,) = _struct.unpack(">I", patched[at - 4 : at])
        patched[at - 4 : at] = _struct.pack(">I", sz + grown)
    d = decode_mp4(bytes(patched))
    assert d["dts"] == [0, 40, 80]
    assert d["sample_delta"] == 40  # first delta, unchanged contract
    assert d["pts"] == [0, 40, 80]


def test_mp4_ctts_count_mismatch_raises():
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    good = encode_mp4(4, 4, [b"a", b"b", b"c"], ctts_offsets=[0, 10, 0])
    bad = bytearray(good)
    idx = good.find(b"ctts")
    # first run count 999 > sample count → must raise, never extend
    bad[idx + 12 : idx + 16] = _struct.pack(">I", 999)
    with _pytest.raises(ValueError, match="ctts"):
        decode_mp4(bytes(bad))


def test_sample_frames_carries_codec_config(spark):
    """The frame-sampling operator emits the decoder-configuration
    blob alongside each kept sample for config-bearing containers and
    NULL for self-describing payloads."""
    from blockchaintoavro_spark.functions.mp4 import encode_mp4
    from blockchaintoavro_spark.operators.multimodal import sample_frames

    avcc = b"\x01\x64\x00\x1f" + b"\xff\xe1\x00\x02\x67\x64"
    mp4 = encode_mp4(
        8, 8, [b"n0", b"n1", b"n2"],
        keyframes=[True, False, True],
        codec=b"avc1", codec_config=avcc,
    )
    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"plain-bytes-payload!"))],
        "doc_id long, payload binary",
    )
    rows = sample_frames(df, frame_bytes=5, every_n=1).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["frame_no"] for r in by_doc[1]) == [0, 2]
    assert all(bytes(r["codec_config"]) == avcc for r in by_doc[1])
    assert all(r["codec_config"] is None for r in by_doc[2])


# ---------------------------------------------------------------------------
# fragmented MP4 (r16 — the DASH/CMAF/streaming-capture shape)


def test_fmp4_roundtrip_frames_keyframes_and_times():
    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    frames = [bytes([k]) * (30 + 7 * k) for k in range(7)]
    mask = [k % 3 == 0 for k in range(7)]
    d = decode_mp4(encode_mp4_fragmented(16, 8, frames, keyframes=mask))
    assert d["fragmented"] is True
    assert d["frames"] == frames  # byte-identical through moof/trun/mdat
    assert d["keyframes"] == [0, 3, 6]  # trun sample flags, not stss
    assert d["dts"] == [k * 40 for k in range(7)]  # tfdt + durations
    assert (d["width"], d["height"]) == (16, 8)
    assert d["sample_delta"] == 40 and d["timescale"] == 1000


def test_fmp4_without_mask_is_all_sync_via_trex_defaults():
    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    frames = [b"a", b"bb", b"ccc"]
    d = decode_mp4(encode_mp4_fragmented(4, 4, frames))
    assert d["keyframes"] == [0, 1, 2]


def test_fmp4_composition_offsets_in_trun():
    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    frames = [b"I", b"P", b"B1", b"B2"]
    offs = [0, 80, -40, -40]  # classic GOP reorder, v1 signed
    d = decode_mp4(
        encode_mp4_fragmented(
            4, 4, frames, ctts_offsets=offs, samples_per_fragment=3
        )
    )
    assert d["pts"] == [0, 120, 40, 80]
    assert d["presentation_order"] == [0, 2, 3, 1]


def test_fmp4_codec_config_rides_the_init_segment():
    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    cfg = b"\x01\x64\x00\x1f\xff\xe1\x00\x02\x67\x64"
    d = decode_mp4(
        encode_mp4_fragmented(
            640, 360, [b"nal0", b"nal1"], codec=b"avc1", codec_config=cfg
        )
    )
    assert d["codec"] == "avc1" and d["codec_config"] == cfg


def test_fmp4_trun_count_bomb_raises_valueerror():
    """The stsz-bomb rule applies to trun too: a corrupted sample count
    must raise before materializing anything."""
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    good = encode_mp4_fragmented(4, 4, [b"xy", b"zw"])
    bad = bytearray(good)
    idx = good.find(b"trun")
    bad[idx + 8 : idx + 12] = _struct.pack(">I", 0xFFFFFFFF)
    with _pytest.raises(ValueError, match="trun"):
        decode_mp4(bytes(bad))


def test_fmp4_truncated_mdat_raises():
    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    good = encode_mp4_fragmented(4, 4, [b"abcdefgh" * 8])
    with _pytest.raises(ValueError):
        decode_mp4(good[:-10])


def test_fmp4_dispatches_through_try_decode_video_and_sampling(spark):
    """The whole video pipeline accepts fMP4: magic dispatch sees the
    ftyp, sample_frames keeps only the declared sync samples and
    carries the codec config."""
    from blockchaintoavro_spark.functions.mp4 import encode_mp4_fragmented
    from blockchaintoavro_spark.functions.video import try_decode_video
    from blockchaintoavro_spark.operators.multimodal import sample_frames

    cfg = b"\x01\x42\x00\x1e"
    payload = encode_mp4_fragmented(
        8, 8, [b"n%d" % k for k in range(6)],
        keyframes=[k % 2 == 0 for k in range(6)],
        codec=b"avc1", codec_config=cfg,
    )
    assert try_decode_video(payload)["format"] == "mp4"
    df = spark.createDataFrame(
        [(3, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = sample_frames(df, every_n=1).collect()
    assert sorted(r["frame_no"] for r in rows) == [0, 2, 4]
    assert all(bytes(r["codec_config"]) == cfg for r in rows)


def test_fmp4_negative_trun_offset_raises():
    """Review r16: a negative trun data_offset must raise — Python's
    negative slicing would otherwise return bytes from the END of the
    file as silently wrong sample payloads."""
    import struct as _struct

    import pytest as _pytest

    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4_fragmented,
    )

    good = encode_mp4_fragmented(4, 4, [b"xy", b"zw"])
    idx = good.find(b"trun")
    bad = bytearray(good)
    # trun body: ver/flags(4) count(4) data_offset(4)
    bad[idx + 12 : idx + 16] = _struct.pack(">i", -10000)
    with _pytest.raises(ValueError, match="outside the file"):
        decode_mp4(bytes(bad))


def test_mp4_sample_entry_padding_bytes_tolerated():
    """Review r16: real muxers pad the sample-entry tail with non-box
    bytes; the codec-config scan must skip them, not fail a decode
    that worked before the scan existed."""
    import struct as _struct

    from blockchaintoavro_spark.functions.mp4 import decode_mp4, encode_mp4

    cfg = b"\x01\x64\x00\x1f"
    good = encode_mp4(
        4, 4, [b"x", b"y"], codec=b"avc1", codec_config=cfg
    )
    at = good.find(b"avcC")
    (csz,) = _struct.unpack(">I", good[at - 4 : at])
    insert_at = at - 4 + csz  # end of the avcC box, inside the entry
    patched = bytearray(
        good[:insert_at] + b"\x00\x00\x00\x00" + good[insert_at:]
    )
    # grow the entry box, stsd and every enclosing box by 4
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stsd",
                 b"avc1"):
        p = bytes(patched).find(name)
        (sz,) = _struct.unpack(">I", patched[p - 4 : p])
        patched[p - 4 : p] = _struct.pack(">I", sz + 4)
    d = decode_mp4(bytes(patched))
    assert d["frames"] == [b"x", b"y"]
    assert d["codec_config"] == cfg  # config before the padding kept


def test_hybrid_moov_plus_moof_appends_fragment_samples():
    """Review r16: a progressive+fragmented capture (populated moov
    AND moof fragments) must decode BOTH sample populations — the
    fragments append after the moov samples, never silently dropped."""
    from blockchaintoavro_spark.functions.mp4 import (
        decode_mp4,
        encode_mp4,
        encode_mp4_fragmented,
    )

    head = [b"h0", b"h1", b"h2"]
    tail = [b"t0", b"t1"]
    flat = encode_mp4(4, 4, head, keyframes=[True, False, True])
    frag = encode_mp4_fragmented(
        4, 4, tail, keyframes=[True, False]
    )
    moof_at = frag.find(b"moof") - 4
    d = decode_mp4(flat + frag[moof_at:])
    assert d["frames"] == head + tail
    assert d["fragmented"] is True
    assert d["keyframes"] == [0, 2, 3]  # stss sync + trun sync
    assert d["n_frames"] == 5
