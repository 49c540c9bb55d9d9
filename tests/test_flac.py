"""FLAC codec tests (VERDICT r15 #3): published check-value pins for
the CRCs, byte-level hand-assembled known-answer streams written
straight from the RFC 9639 grammar (independent of the module's own
encoder), exact round-trips through every subframe type / stereo mode /
depth, corruption loudness, and the AFP / magic-dispatch integration."""

import hashlib

import pytest

from blockchaintoavro_spark.functions.flac import (
    _decode_coded_number,
    _encode_coded_number,
    _BitReader,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


# ---------------------------------------------------------------------------
# primitives pinned to published values


def test_crc_check_values_match_published_vectors():
    # CRC-8 poly 0x07 init 0 (SMBus) and CRC-16 poly 0x8005 init 0
    # non-reflected (UMTS/BUYPASS) — the classic "123456789" checks
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def test_coded_number_matches_utf8_on_codepoint_range():
    # FLAC's coded numbers coincide with UTF-8 up to U+10FFFF
    for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0x10FFFF):
        assert _encode_coded_number(n) == chr(n).encode(
            "utf-8", "surrogatepass"
        )


def test_coded_number_roundtrips_to_36_bits():
    for n in (0, 1, 127, 128, 2047, 2048, 65535, (1 << 21) - 1,
              (1 << 31) + 12345, (1 << 36) - 1):
        r = _BitReader(_encode_coded_number(n))
        assert _decode_coded_number(r) == n
    with pytest.raises(ValueError):
        _encode_coded_number(1 << 36)


# ---------------------------------------------------------------------------
# hand-assembled known-answer streams (written from the spec grammar,
# NOT via encode_flac — so the decoder is checked against the spec, not
# against its own twin)


class _Bits:
    """Minimal independent MSB-first bit assembler for fixtures."""

    def __init__(self):
        self.s = ""

    def put(self, value, bits):
        self.s += format(value & ((1 << bits) - 1), f"0{bits}b")

    def bytes(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(rate, channels, bits, total, md5=b"\x00" * 16):
    b = _Bits()
    b.put(16, 16)  # min block size
    b.put(16, 16)  # max block size
    b.put(0, 24)
    b.put(0, 24)
    b.put(rate, 20)
    b.put(channels - 1, 3)
    b.put(bits - 1, 5)
    b.put(total, 36)
    body = b.bytes() + md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_hand_assembled_constant_frame_decodes():
    """4 samples of the constant 1000: CONSTANT subframe, 8-bit block
    size form, every field placed by hand per RFC 9639."""
    hdr = _Bits()
    hdr.put(0b11111111111110, 14)  # sync
    hdr.put(0, 1)  # reserved
    hdr.put(0, 1)  # fixed blocksize strategy
    hdr.put(0b0110, 4)  # block size: 8-bit (bs-1) follows
    hdr.put(0b0000, 4)  # sample rate: from STREAMINFO
    hdr.put(0, 4)  # channel assignment: 1 channel
    hdr.put(0b100, 3)  # sample size: 16-bit
    hdr.put(0, 1)  # reserved
    hdr.put(0, 8)  # coded frame number 0
    hdr.put(3, 8)  # block size - 1
    hdr_bytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)  # subframe pad
    body.put(0b000000, 6)  # CONSTANT
    body.put(0, 1)  # no wasted bits
    body.put(1000, 16)
    frame = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    d = decode_flac(_streaminfo(8000, 1, 16, 4) + frame)
    assert d["samples"] == [1000, 1000, 1000, 1000]
    assert (d["sample_rate"], d["channels"], d["bits"]) == (8000, 1, 16)


def test_hand_assembled_fixed_order1_rice_frame_decodes():
    """Samples [10, 12, 11, 13] as FIXED order 1: warmup 10, residuals
    [2, -1, 2] → zigzag [4, 1, 4] → Rice p=2 — every unary/remainder
    bit written by hand, so a flipped unary sense or zigzag map in the
    decoder cannot pass."""
    hdr = _Bits()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)
    hdr.put(0, 1)
    hdr.put(0b0110, 4)
    hdr.put(0b0000, 4)
    hdr.put(0, 4)
    hdr.put(0b100, 3)
    hdr.put(0, 1)
    hdr.put(0, 8)
    hdr.put(3, 8)  # 4 samples
    hdr_bytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)
    body.put(0b001001, 6)  # FIXED order 1
    body.put(0, 1)
    body.put(10, 16)  # warmup
    body.put(0, 2)  # residual method 0 (4-bit Rice)
    body.put(0, 4)  # partition order 0
    body.put(2, 4)  # Rice parameter 2
    # u=4: q=1 → "01", r=00 ; u=1: q=0 → "1", r=01 ; u=4 → "01" "00"
    body.put(0b01, 2)
    body.put(0b00, 2)
    body.put(0b1, 1)
    body.put(0b01, 2)
    body.put(0b01, 2)
    body.put(0b00, 2)
    frame = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    d = decode_flac(_streaminfo(44100, 1, 16, 4) + frame)
    assert d["samples"] == [10, 12, 11, 13]


def test_hand_assembled_wasted_bits_subframe_decodes():
    """CONSTANT subframe with 3 wasted bits: flag 1 + unary(2), value
    coded at 13 bits, output shifted back left by 3."""
    hdr = _Bits()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)
    hdr.put(0, 1)
    hdr.put(0b0110, 4)
    hdr.put(0b0000, 4)
    hdr.put(0, 4)
    hdr.put(0b100, 3)
    hdr.put(0, 1)
    hdr.put(0, 8)
    hdr.put(1, 8)  # 2 samples
    hdr_bytes = hdr.bytes()
    body = _Bits()
    body.put(0, 1)
    body.put(0b000000, 6)
    body.put(1, 1)  # wasted bits follow
    body.put(0b001, 3)  # unary 2 → k-1=2 → k=3
    body.put(100, 13)  # 16-3 bits; 100 << 3 = 800
    frame = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    d = decode_flac(_streaminfo(8000, 1, 16, 2) + frame)
    assert d["samples"] == [800, 800]


# ---------------------------------------------------------------------------
# round-trips (encoder fixtures; MD5 in STREAMINFO is real, so every
# round-trip is verified against the checksum inside the decoder too)


def _signal(n, seed=3):
    # deterministic tonal-ish signal with noise, pure arithmetic
    return [
        ((seed * 997 + i * 131) % 4001) - 2000 + (i % 37) * 11
        for i in range(n)
    ]


def test_roundtrip_fixed_predictors_multiframe():
    sig = _signal(1000)
    blob = encode_flac(16000, 1, sig, block_size=192)
    d = decode_flac(blob)
    assert d["samples"] == sig
    assert d["n_frames"] == 1000
    assert len(blob) < 2 * len(sig)  # actually compresses


def test_roundtrip_lpc_subframes():
    sig = _signal(700, seed=9)
    d = decode_flac(encode_flac(8000, 1, sig, block_size=256, lpc_order=8))
    assert d["samples"] == sig


def test_roundtrip_verbatim_and_constant():
    assert decode_flac(
        encode_flac(8000, 1, [5] * 300)
    )["samples"] == [5] * 300
    sig = _signal(100)
    d = decode_flac(encode_flac(8000, 1, sig, verbatim=True))
    assert d["samples"] == sig


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_roundtrip_stereo_decorrelation_modes(mode):
    base = _signal(500, seed=11)
    inter = []
    for i in range(500):
        left = base[i]
        right = base[i] + ((i * 7) % 89) - 44
        inter += [left, right]
    d = decode_flac(
        encode_flac(44100, 2, inter, block_size=100, stereo_mode=mode)
    )
    assert d["samples"] == inter
    assert d["channels"] == 2


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_roundtrip_depths_are_exact_identity(bits):
    sig = _signal(300, seed=bits)
    d = decode_flac(encode_flac(8000, 1, sig, bits=bits))
    assert d["samples"] == sig and d["bits"] == bits


def test_roundtrip_outlier_spikes_take_escape_path():
    sig = [0] * 64
    sig[10], sig[11] = 32767, -32768
    blob = encode_flac(8000, 1, sig, block_size=64)
    assert decode_flac(blob)["samples"] == sig


def test_roundtrip_wasted_bits_detected_by_encoder():
    sig = [s & ~0x3F for s in _signal(256)]  # 6 trailing zero bits
    blob = encode_flac(8000, 1, sig, block_size=128)
    plain = encode_flac(8000, 1, _signal(256), block_size=128)
    assert decode_flac(blob)["samples"] == sig
    assert len(blob) < len(plain)  # the shift actually engaged


def test_roundtrip_hypothesis_random_streams():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=2,
            max_size=400,
        ),
        st.sampled_from([1, 2]),
        st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]
        ),
        st.sampled_from([0, 4]),
    )
    def run(samples, channels, mode, lpc):
        if len(samples) % channels:
            samples = samples[: len(samples) - 1]
        if not samples:
            return
        if channels == 1:
            mode = "independent"
        d = decode_flac(
            encode_flac(
                8000, channels, samples, block_size=64,
                stereo_mode=mode, lpc_order=lpc,
            )
        )
        assert d["samples"] == samples

    run()


# ---------------------------------------------------------------------------
# loudness on corruption


def test_any_bit_flip_in_frame_raises():
    sig = _signal(200)
    blob = bytearray(encode_flac(8000, 1, sig, block_size=64))
    # flip a bit inside the first frame's audio payload
    flip_at = len(blob) - 40
    blob[flip_at] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_truncation_raises():
    blob = encode_flac(8000, 1, _signal(200))
    for cut in (3, 10, 41, len(blob) - 1):
        with pytest.raises(ValueError):
            decode_flac(blob[:cut])


def test_md5_mismatch_raises():
    """A stream whose frames decode cleanly but whose STREAMINFO MD5
    disagrees (a mis-muxed or silently-corrupted file) must raise."""
    blob = bytearray(encode_flac(8000, 1, _signal(64), block_size=64))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34 of the file
    blob[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF" + b"\x00" * 60)


def test_sample_count_mismatch_raises():
    blob = bytearray(encode_flac(8000, 1, _signal(64), block_size=64))
    # claim 99 total samples in STREAMINFO (36-bit field ends byte 8+18)
    blob[8 + 17] = 99
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


# ---------------------------------------------------------------------------
# integration: magic dispatch + AFP fingerprints over FLAC


def test_try_decode_audio_dispatches_flac():
    from blockchaintoavro_spark.functions.audio import try_decode_audio

    sig = _signal(400)
    d = try_decode_audio(encode_flac(22050, 1, sig))
    assert d is not None and d["format"] == "flac"
    assert d["samples"] == sig


def test_afp_codes_identical_for_wav_and_flac(spark):
    """The SAME audio through WAV and FLAC containers must produce the
    SAME AFP fingerprint — the fingerprint hangs off decoded samples,
    not the container."""
    from blockchaintoavro_spark.functions.audio import encode_wav
    from blockchaintoavro_spark.operators.afp import afp_codes

    sig = _signal(9 * 64 * 4)
    wav = encode_wav(8000, 1, sig)
    flac = encode_flac(8000, 1, sig)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(flac))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["afp"] for r in afp_codes(df).collect()}
    assert got[1] == got[2]


def test_flac_md5_matches_external_hash_of_pcm():
    """The STREAMINFO MD5 the encoder writes equals hashlib's MD5 of
    the raw little-endian PCM — pinning the byte order and width
    conventions to the spec's, independent of the decoder."""
    sig = _signal(128)
    blob = encode_flac(8000, 1, sig)
    import struct

    want = hashlib.md5(struct.pack(f"<{len(sig)}h", *sig)).digest()
    assert blob[8 + 18 : 8 + 34] == want


def test_flac_random_bitflip_fuzz_never_silently_wrong():
    """Corruption totality (the Avro/media fuzz convention): flipping
    any single bit in a valid stream must either raise ValueError or —
    only for flips the format genuinely does not cover (e.g. inside
    the unverified metadata-length headers that still parse) — decode
    to the SAME verified samples. It must never return different
    audio, hang, or surface a non-ValueError."""
    import random

    sig = _signal(300, seed=21)
    blob = bytearray(encode_flac(8000, 1, sig, block_size=64))
    rng = random.Random(0xF1AC)
    silent_ok = 0
    for _ in range(400):
        i = rng.randrange(len(blob))
        bit = 1 << rng.randrange(8)
        blob[i] ^= bit
        try:
            d = decode_flac(bytes(blob))
            assert d["samples"] == sig, (
                f"bit flip at byte {i} changed decoded audio silently"
            )
            silent_ok += 1
        except ValueError:
            pass
        finally:
            blob[i] ^= bit
    # the stream is CRC/MD5-armored nearly everywhere: flips that still
    # decode (identically) should be rare
    assert silent_ok < 40, silent_ok


def test_decompression_bomb_constant_frames_raise(capsys):
    """Review r16: a crafted stream of large CONSTANT frames expands
    ~3000:1 — the decode must hit the amplification cap with a
    ValueError, never accumulate gigabytes."""
    body = _Bits()
    body.put(0, 1)
    body.put(0b000000, 6)  # CONSTANT
    body.put(0, 1)
    body.put(0, 16)
    hdr = _Bits()
    hdr.put(0b11111111111110, 14)
    hdr.put(0, 1)
    hdr.put(0, 1)
    hdr.put(0b0111, 4)  # 16-bit (bs-1) follows
    hdr.put(0b0000, 4)
    hdr.put(0, 4)
    hdr.put(0b100, 3)
    hdr.put(0, 1)
    hdr.put(0, 8)  # frame number 0 (decoder does not cross-check)
    hdr.put(65534, 16)  # bs = 65535 samples from a ~20-byte frame
    hdr_bytes = hdr.bytes()
    frame = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame += crc16(frame).to_bytes(2, "big")
    blob = _streaminfo(8000, 1, 16, 0) + frame * 50  # declares 3.2M
    with pytest.raises(ValueError, match="cap"):
        decode_flac(blob, max_samples=100_000)


def test_declared_total_beyond_cap_raises_before_decoding():
    blob = encode_flac(8000, 1, _signal(64), block_size=64)
    with pytest.raises(ValueError, match="cap"):
        decode_flac(blob, max_samples=10)


def test_block_size_validation():
    sig = _signal(64)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(8000, 1, sig, block_size=0)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(8000, 1, sig, block_size=70000)
