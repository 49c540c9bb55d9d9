"""WAV codec (functions/audio.py) — round-trips, stdlib-``wave``
cross-validation, corruption guards, and the Spark-side audio feature
extraction plumbing (operators/multimodal.py)."""

import io
import struct
import wave

import pytest
from hypothesis import given
from hypothesis import strategies as st

from blockchaintoavro_spark.functions.audio import (
    decode_wav,
    encode_wav,
    sample_checksum,
    sample_energy,
    try_decode_audio,
)

_sample = st.integers(min_value=-32768, max_value=32767)


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=96000),
    st.lists(_sample, max_size=64),
)
def test_wav_roundtrip_identity(channels, rate, samples):
    samples = samples[: len(samples) - len(samples) % channels]
    d = decode_wav(encode_wav(rate, channels, samples))
    assert d["samples"] == samples
    assert d["sample_rate"] == rate
    assert d["channels"] == channels
    assert d["n_frames"] == len(samples) // channels


def test_wav_8bit_roundtrip():
    """8-bit path is exact for samples that are multiples of 256."""
    samples = [(i - 128) * 256 for i in range(256)]
    d = decode_wav(encode_wav(8000, 1, samples, bits=8))
    assert d["bits"] == 8
    assert d["samples"] == samples


def test_stdlib_wave_reads_our_output():
    """Cross-impl: CPython's stdlib ``wave`` parses our RIFF bytes and
    recovers identical PCM — the interop check a from-scratch codec
    needs (a mutually-consistent format deviation can't hide)."""
    samples = [((i * 37) % 65536) - 32768 for i in range(120)]
    w = wave.open(io.BytesIO(encode_wav(22050, 2, samples)))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (2, 2, 22050)
    assert w.getnframes() == 60
    got = list(struct.unpack("<120h", w.readframes(60)))
    assert got == samples


def test_we_read_stdlib_wave_output():
    samples = [((i * 91) % 65536) - 32768 for i in range(90)]
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(3)
    w.setsampwidth(2)
    w.setframerate(44100)
    w.writeframes(struct.pack("<90h", *samples))
    w.close()
    d = decode_wav(buf.getvalue())
    assert (d["channels"], d["sample_rate"], d["n_frames"]) == (3, 44100, 30)
    assert d["samples"] == samples


def test_wav_skips_unknown_chunks_and_pads():
    """Spec behavior: unknown chunks (incl. odd-length + pad byte) before
    ``data`` are skipped, not fatal."""
    samples = [100, -100, 200, -200]
    b = encode_wav(8000, 1, samples)
    # splice a 3-byte 'LIST' chunk (odd → 1 pad byte) after fmt
    fmt_end = b.index(b"data")
    spliced = b[:fmt_end] + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + b[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["samples"] == samples


@pytest.mark.parametrize(
    "mangle",
    [
        lambda b: b[:8],  # truncated header
        lambda b: b"JUNK" + b[4:],  # bad RIFF magic
        lambda b: b[:-5],  # truncated data chunk
        lambda b: b.replace(struct.pack("<HH", 1, 1), struct.pack("<HH", 3, 1), 1),  # IEEE float tag
    ],
)
def test_wav_corruption_raises(mangle):
    b = encode_wav(8000, 1, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        decode_wav(mangle(b))


def test_try_decode_audio_dispatch():
    assert try_decode_audio(None) is None
    assert try_decode_audio(b"\x89PNG\r\n\x1a\n rest") is None
    assert try_decode_audio(encode_wav(8000, 1, [0, 1]))["n_frames"] == 2


def test_checksum_is_positional():
    assert sample_checksum([1, 2]) != sample_checksum([2, 1])
    assert sample_energy([-5, 3]) == 34


def test_extract_audio_features_mixed_payloads(spark):
    """Spark plumbing: WAV payloads decode for real, others zero out;
    one corrupt payload can't fail the stage (totality)."""
    from blockchaintoavro_spark.operators.multimodal import (
        extract_audio_features,
    )

    wav = encode_wav(16000, 2, [10, -10, 20, -20])
    rows = [(0, bytearray(wav)), (1, b"not audio"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in extract_audio_features(df).collect()}
    assert got[0]["is_audio"] and got[0]["sample_rate"] == 16000
    assert got[0]["channels"] == 2 and got[0]["n_frames"] == 2
    assert got[0]["checksum"] == sample_checksum([10, -10, 20, -20])
    assert not got[1]["is_audio"] and got[1]["n_frames"] == 0
    assert not got[2]["is_audio"] and got[2]["n_bytes"] == 0


@pytest.mark.parametrize("bits", [24, 32])
def test_wav_deep_pcm_roundtrip_identity(bits):
    """24/32-bit PCM (r5 VERDICT 'audio beyond 8/16-bit'): encode widens
    int16-range samples into the deeper depth, decode arithmetic-shifts
    back — identity for the full int16 range including negatives."""
    samples = [-32768, -1, 0, 1, 32767, -12345, 12345, 256]
    d = decode_wav(encode_wav(48000, 2, samples, bits=bits))
    assert d["bits"] == bits
    assert d["samples"] == samples
    assert d["n_frames"] == 4


@pytest.mark.parametrize("width,bits", [(3, 24), (4, 32)])
def test_stdlib_wave_cross_reads_deep_pcm(width, bits):
    """Cross-impl both directions at 24/32-bit: stdlib ``wave`` parses
    our deep-PCM bytes (header + raw frames identical), and we decode a
    wave-module-written file to the same widened samples."""
    samples = [((i * 1103) % 65536) - 32768 for i in range(60)]
    ours = encode_wav(16000, 2, samples, bits=bits)
    w = wave.open(io.BytesIO(ours))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (2, width, 16000)
    raw = w.readframes(30)

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(width)
    ww.setframerate(16000)
    ww.writeframes(raw)
    ww.close()
    d = decode_wav(buf.getvalue())
    assert d["bits"] == bits
    assert d["samples"] == samples


def test_wav_float32_decode():
    """IEEE float32 (tag 3) decodes to the int16-range contract with
    clamping; built with struct (stdlib wave has no float support)."""
    vals = [0.0, 1.0, -1.0, 0.5, -0.25, 2.0, -3.0]  # incl. out-of-range
    data = struct.pack(f"<{len(vals)}f", *vals)
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    wavb = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d = decode_wav(wavb)
    assert d["samples"] == [0, 32767, -32767, 16384, -8192, 32767, -32767]


def test_wav_extensible_wrapper_decodes_pcm():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) with a PCM SubFormat GUID — the
    pro-audio wrapper — resolves to the plain PCM path."""
    samples = [10, -10, 300, -300]
    plain = encode_wav(8000, 1, samples, bits=24)
    # rebuild the fmt chunk as extensible: 16 common bytes + cbSize=22 +
    # validBits + channelMask + SubFormat GUID (PCM = 0x0001 leading)
    fmt16 = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000 * 3, 3, 24)
    guid = bytes.fromhex("01000000" "0000" "1000" "8000" "00aa00389b71")
    ext = fmt16 + struct.pack("<HHI", 22, 24, 0x4) + guid
    i = plain.find(b"fmt ")
    j = plain.find(b"data")
    rebuilt = (
        plain[:i] + b"fmt " + struct.pack("<I", len(ext)) + ext + plain[j:]
    )
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    d = decode_wav(rebuilt)
    assert d["samples"] == samples
    assert d["bits"] == 24


@pytest.mark.parametrize(
    "mangle2",
    [
        lambda b: b.replace(b"\x18\x00", b"\x40\x00", 1),  # 24 -> 64 bits
        lambda b: b[: b.find(b"data") + 8] + b[b.find(b"data") + 9:],  # 24-bit len % 3
    ],
)
def test_wav_deep_corruption_raises(mangle2):
    b = encode_wav(8000, 1, [1, 2, 3], bits=24)
    with pytest.raises(ValueError):
        decode_wav(mangle2(b))


@pytest.mark.parametrize("tag,aop", [(7, "ulaw2lin"), (6, "alaw2lin")])
def test_wav_g711_decode_matches_audioop(tag, aop):
    """G.711 µ-law/A-law expansion must agree byte-for-byte with the
    CPython reference implementation (stdlib audioop, the same G.711
    tables every telephony stack uses) across all 256 code points."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    codes = bytes(range(256))
    ref = list(struct.unpack("<256h", getattr(audioop, aop)(codes, 2)))
    fmt = struct.pack("<HHIIHH", tag, 1, 8000, 8000, 1, 8)
    wavb = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(codes)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    d = decode_wav(wavb)
    assert d["samples"] == ref
    assert d["n_frames"] == 256


def test_wav_g711_wrong_depth_raises():
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
    wavb = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 2) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="G.711"):
        decode_wav(wavb)


def test_wav_24bit_encode_rejects_out_of_range():
    """Review fix: bit 23 must not silently wrap the sign — out-of-int16
    input raises like the struct-enforced 16/32-bit paths."""
    with pytest.raises(ValueError, match="out of int16 range"):
        encode_wav(8000, 1, [40000], bits=24)
