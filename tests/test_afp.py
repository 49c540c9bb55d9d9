"""Perceptual audio near-dup (operators/afp.py) — unit vectors for the
63-bit band-energy fingerprint, robustness/separation properties, and
the reused Hamming-banded retrieval."""

from __future__ import annotations

import numpy as np
import pytest

from blockchaintoavro_spark.operators.afp import (
    FIXTURE_SAMPLES,
    afp63,
    afp_codes,
    afp_neardup_pairs,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_afp_silence_and_empty_are_zero():
    """Constant (or empty) audio: every cell sums to the same value per
    block position, all band energies repeat across time, every
    time-delta is 0 → not > 0 → code 0."""
    assert afp63([], 1) == 0
    assert afp63([0] * 1152, 1) == 0
    assert afp63([1234] * 1152, 1) == 0


def test_afp_is_63_bit_deterministic_integer():
    rnd = np.random.RandomState(7)
    s = rnd.randint(-32768, 32768, 2048)
    c1 = afp63(s, 1)
    c2 = afp63(list(int(v) for v in s), 1)
    assert c1 == c2  # ndarray vs list input
    assert 0 <= c1 < (1 << 63)
    assert c1 != 0


def test_afp_gain_shift_invariance():
    """The Haitsma-Kalker property the construction exists for: a
    uniform gain change scales every energy by the same factor, so no
    sign of an energy-delta-delta can flip."""
    rnd = np.random.RandomState(3)
    s = rnd.randint(-8000, 8000, 1152)
    assert afp63(s, 1) == afp63(s * 2, 1) == afp63(s * 4, 1)


def test_afp_robust_to_small_perturbation_distinct_for_different_audio():
    """±small noise on a few samples moves the code a few bits; a
    spectrally different clip is far away."""
    i = np.arange(FIXTURE_SAMPLES, dtype=np.int64)
    base = (131 + 17 * i + (i * i) % 101) % 32768 - 16384
    noisy = base.copy()
    noisy[8] += 64
    other = (262 + 17 * i + (i * i) % 149) % 32768 - 16384
    c0, cn, co = afp63(base, 1), afp63(noisy, 1), afp63(other, 1)
    assert _ham(c0, cn) <= 6
    assert _ham(c0, co) >= 12


def test_afp_stereo_sum_mix():
    """2-channel input mixes by per-frame SUM: duplicating a mono clip
    into identical L/R doubles every cell — a uniform gain, so the code
    equals the mono code."""
    rnd = np.random.RandomState(11)
    mono = rnd.randint(-8000, 8000, 1152)
    stereo = np.repeat(mono, 2)  # interleave L=R
    assert afp63(stereo, 2) == afp63(mono, 1)


def test_afp_codes_skips_null_and_undecodable(spark):
    from blockchaintoavro_spark.functions.audio import encode_wav

    rnd = np.random.RandomState(5)
    s = [int(v) for v in rnd.randint(-32768, 32768, 600)]
    good = encode_wav(8000, 1, s, 16)
    rows = [
        (1, bytearray(good)),
        (2, None),
        (3, bytearray(b"not audio at all")),
        # WAV magic but corrupt body: try_decode_audio raises loudly;
        # the dedup map must SKIP, not fail the stage
        (4, bytearray(good[:30])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = afp_codes(df).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["afp"] == afp63(s, 1)


def test_afp_banded_retrieval_exact_vs_brute_force(spark):
    """The reused banded join is exact on afp codes: banded pairs ==
    brute-force Hamming ≤ 3 over codes seeded at distances 0..5."""
    rnd = np.random.RandomState(42)
    codes = list(rnd.randint(0, 1 << 62, 30, dtype=np.int64))
    for d in range(6):
        c = int(codes[d])
        for b in rnd.choice(63, size=d, replace=False):
            c ^= 1 << int(b)
        codes.append(c)
    df = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(codes)], "doc_id long, afp long"
    )
    got = sorted(map(tuple, afp_neardup_pairs(df, max_hamming=3).collect()))
    brute = sorted(
        (i, j, _ham(int(codes[i]), int(codes[j])))
        for i in range(len(codes))
        for j in range(i + 1, len(codes))
        if _ham(int(codes[i]), int(codes[j])) <= 3
    )
    assert got == brute and len(brute) >= 4


def test_afp_neardup_rejects_unpigeonholeable_radius(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, afp long")
    with pytest.raises(ValueError, match="max_hamming < n_bands"):
        afp_neardup_pairs(df, max_hamming=4, n_bands=4)


def test_afp_fixture_groups_are_neardups_and_groups_separate(spark):
    """The declared-query fixture's structural contract: the five
    perturbed variants of a base clip sit within a few bits; different
    base clips (group-dependent spectral modulus) are far apart, so the
    pair output is linear in corpus size."""
    from blockchaintoavro_spark.operators.afp import afp_fixture_codes

    df = spark.range(30).withColumnRenamed("id", "doc_id")
    codes = {r["doc_id"]: r["afp"] for r in afp_fixture_codes(df).collect()}
    for g in range(6):
        base = codes[g * 5]
        for r in range(1, 5):
            assert _ham(base, codes[g * 5 + r]) <= 6
    for g1 in range(6):
        for g2 in range(g1 + 1, 6):
            assert _ham(codes[g1 * 5], codes[g2 * 5]) >= 10


def test_audio_clip_match_finds_embedded_excerpt(spark):
    """Audio clip-in-clip search: an excerpt cut on the hop grid of a
    long recording is found at the correct window offset via windowed
    AFP codes + the video shingle/offset-voting matcher; a spectrally
    different decoy never matches."""
    import numpy as np

    from blockchaintoavro_spark.functions.audio import encode_wav
    from blockchaintoavro_spark.operators.afp import audio_clip_matches

    win, hop = 512, 256

    def pcm(n, a, b, m):
        i = np.arange(n, dtype=np.int64)
        return ((a * i + (i * i) % m) % 32768 - 16384).astype(np.int64)

    src = pcm(hop * 60 + win, 131, 0, 1009)       # 60 windows
    decoy = pcm(hop * 60 + win, 377, 0, 1511)
    cut = 17  # excerpt starts at window 17 on the hop grid
    excerpt = src[cut * hop : cut * hop + hop * 11 + win]  # 11 windows

    wav = lambda s: encode_wav(8000, 1, [int(v) for v in s], 16)
    corpus = spark.createDataFrame(
        [(1, wav(src)), (2, wav(decoy))], "doc_id long, payload binary"
    )
    clips = spark.createDataFrame(
        [(900, wav(excerpt))], "doc_id long, payload binary"
    )
    got = audio_clip_matches(
        clips, corpus, k=5, min_votes=2,
        window_samples=win, hop_samples=hop,
    ).collect()
    rows = [
        (r["clip_id"], r["video_id"], r["offset"], r["n_votes"]) for r in got
    ]
    # 12 windows in the excerpt → 12 − k + 1 = 8 aligned shingles; the
    # true alignment must be present with full votes and nothing may
    # point at the decoy
    assert (900, 1, cut, 8) in rows, rows
    assert all(v == 1 for (_, v, _, _) in rows), rows

    # off-grid cut: windows sample different byte ranges → codes differ
    # → no alignment (the documented hop-grid contract)
    off = spark.createDataFrame(
        [(901, wav(src[cut * hop + 37 : cut * hop + 37 + hop * 11 + win]))],
        "doc_id long, payload binary",
    )
    got2 = audio_clip_matches(
        off, corpus, k=5, min_votes=2,
        window_samples=win, hop_samples=hop,
    ).collect()
    assert got2 == [] or all(r["n_votes"] < 8 for r in got2)


def test_audio_clip_matches_robust_survives_reencode_noise(spark):
    """r10 VERDICT #2, audio leg: a hop-aligned excerpt whose samples
    were perturbed (a deterministic stand-in for transcode noise, which
    flips a few AFP bits per window) is blind to the exact shingled
    matcher but still aligns via per-window banded Hamming voting — the
    top-vote alignment is the true (recording, hop offset)."""
    from blockchaintoavro_spark.functions.audio import encode_wav
    from blockchaintoavro_spark.operators.afp import (
        audio_clip_matches,
        audio_clip_matches_robust,
    )

    W, H = 1024, 512
    n = W + 9 * H  # 10 windows
    rec = [
        (131 * 1 + 17 * i + (i * i) % 101) % 32768 - 16384 for i in range(n)
    ]
    cut = rec[3 * H : 3 * H + W + 4 * H]  # 5 windows at hop offset 3
    noisy = [max(-16384, min(16383, s + (i * i) % 97 - 48))
             for i, s in enumerate(cut)]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, payload binary")
    corpus = mk([(1, encode_wav(8000, 1, rec, 16))])
    clips = mk([(100, encode_wav(8000, 1, noisy, 16))])

    kw = dict(window_samples=W, hop_samples=H)
    # the exact shingled matcher never sees the noisy excerpt
    assert audio_clip_matches(clips, corpus, k=3, min_votes=1, **kw).count() == 0
    got = audio_clip_matches_robust(
        clips, corpus, max_hamming=3, min_votes=2, **kw
    ).collect()
    assert got, "robust matcher found nothing"
    top = max(got, key=lambda r: r["n_votes"])
    assert (top["clip_id"], top["video_id"], top["offset"]) == (100, 1, 3)
    # a clean excerpt still collects every window's vote
    clean = audio_clip_matches_robust(
        mk([(200, encode_wav(8000, 1, cut, 16))]), corpus,
        max_hamming=3, min_votes=2, **kw,
    ).collect()
    assert any(
        (r["clip_id"], r["video_id"], r["offset"], r["n_votes"])
        == (200, 1, 3, 5)
        for r in clean
    )
