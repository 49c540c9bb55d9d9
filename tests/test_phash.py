"""Perceptual image near-dup (operators/phash.py) — unit vectors for the
63-bit pHash, exactness of the Hamming-banded retrieval, and the
banded-join plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blockchaintoavro_spark.operators.phash import (
    luma_plane,
    phash63,
    phash_codes,
    phash_neardup_pairs,
)


def test_phash_flat_image_is_zero():
    """A constant image has an all-zero AC spectrum: every coefficient
    equals the median (0), no bit exceeds it → code 0, at any size."""
    for w, h, v in [(32, 32, 0), (32, 32, 200), (64, 48, 77)]:
        assert phash63(bytes([v] * (w * h)), w, h, 1) == 0


def test_phash_is_63_bit_and_deterministic():
    rnd = np.random.RandomState(7)
    px = rnd.randint(0, 256, 32 * 32, dtype=np.uint8).tobytes()
    c1 = phash63(px, 32, 32, 1)
    c2 = phash63(px, 32, 32, 1)
    assert c1 == c2
    assert 0 <= c1 < (1 << 63)
    # a non-degenerate image thresholds ~half its 63 AC coeffs above
    # the median: exactly 31 bits set (median of 63 = 32nd order stat)
    assert bin(c1).count("1") == 31


def test_phash_robust_to_small_noise_distinct_for_different_images():
    """The perceptual property: ±2 pixel noise moves the code a few
    bits; an unrelated image is ~32 bits away."""
    rnd = np.random.RandomState(11)
    base = rnd.randint(10, 246, 32 * 32).astype(np.uint8)
    noisy = (base + rnd.randint(-2, 3, base.size)).clip(0, 255).astype(np.uint8)
    other = rnd.randint(0, 256, 32 * 32).astype(np.uint8)
    c0 = phash63(base.tobytes(), 32, 32, 1)
    cn = phash63(noisy.tobytes(), 32, 32, 1)
    co = phash63(other.tobytes(), 32, 32, 1)
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(c0, cn) <= 6
    assert ham(c0, co) >= 16


def test_phash_resize_invariance_on_2x_upscale():
    """A 64×64 image of 2×2-constant superpixels box-resizes exactly to
    its 32×32 source — the fixture-oracle contract."""
    rnd = np.random.RandomState(3)
    block = rnd.randint(0, 256, (32, 32)).astype(np.uint8)
    big = np.repeat(np.repeat(block, 2, axis=0), 2, axis=1)
    assert phash63(big.tobytes(), 64, 64, 1) == phash63(
        block.tobytes(), 32, 32, 1
    )


def test_luma_plane_bt601_integer():
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    y = luma_plane(px, 2, 2, 3)
    assert list(y) == [
        299 * 255 // 1000,
        587 * 255 // 1000,
        114 * 255 // 1000,
        (299 * 10 + 587 * 20 + 114 * 30) // 1000,
    ]
    assert luma_plane(px[:4], 2, 2, 1) == px[:4]


def test_banded_retrieval_exact_vs_brute_force(spark):
    """Pigeonhole exactness: banded pairs == brute-force Hamming ≤ 3 on
    a code set seeded with true near-dups at distances 0..5."""
    rnd = np.random.RandomState(42)
    codes = list(rnd.randint(0, 1 << 62, 40, dtype=np.int64))
    # seed near-dups: flip 0..5 bits of code[i] for i in 0..5
    for d in range(6):
        c = int(codes[d])
        for b in rnd.choice(63, size=d, replace=False):
            c ^= 1 << int(b)
        codes.append(c)
    df = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(codes)], "doc_id long, phash long"
    )
    got = sorted(
        map(tuple, phash_neardup_pairs(df, max_hamming=3).collect())
    )
    brute = sorted(
        (i, j, bin(int(codes[i]) ^ int(codes[j])).count("1"))
        for i in range(len(codes))
        for j in range(i + 1, len(codes))
        if bin(int(codes[i]) ^ int(codes[j])).count("1") <= 3
    )
    assert got == brute and len(brute) >= 4  # distances 0,1,2,3 seeded


def test_phash_neardup_rejects_unpigeonholeable_radius(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, phash long")
    with pytest.raises(ValueError, match="max_hamming < n_bands"):
        phash_neardup_pairs(df, max_hamming=4, n_bands=4)


def test_phash_codes_skips_null_and_undecodable(spark):
    from blockchaintoavro_spark.functions.imaging import encode_png

    rnd = np.random.RandomState(5)
    px = rnd.randint(0, 256, 32 * 32, dtype=np.uint8).tobytes()
    rows = [
        (1, bytearray(encode_png(32, 32, px, 1))),
        (2, None),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = phash_codes(df).collect()
    assert [r["doc_id"] for r in got] == [1]
    assert got[0]["phash"] == phash63(px, 32, 32, 1)


def test_phash_neardup_plan_is_banded_equi_join(spark):
    """The candidate join must be a shuffled equi-join on (band_id,
    band_val) — no cartesian product, no nested loop (the property that
    holds at 100 TB)."""
    df = spark.createDataFrame(
        [(i, i * 977) for i in range(50)], "doc_id long, phash long"
    )
    pairs = phash_neardup_pairs(df, max_hamming=3)
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# video leg


def _make_dib_avi(frame_blocks):
    """32×32 gray blocks → 3-frame-capable raw DIB AVI (64×64, B=G=R)."""
    from blockchaintoavro_spark.functions.video import encode_avi

    frames = []
    for block in frame_blocks:
        img = np.repeat(np.repeat(block, 2, axis=0), 2, axis=1)
        frames.append(np.repeat(img[::-1], 3, axis=1).tobytes())
    return encode_avi(64, 64, frames, fourcc=b"DIB ")


def test_video_phash_codes_match_still_phash(spark):
    """Per-frame codes through the AVI container must equal phash63 of
    the same blocks hashed as stills (the DIB unpack + luma path is
    lossless for gray)."""
    from blockchaintoavro_spark.operators.phash import video_phash_codes

    rnd = np.random.RandomState(21)
    blocks = [rnd.randint(0, 256, (32, 32)).astype(np.uint8) for _ in range(3)]
    good = _make_dib_avi(blocks)
    rows = [(7, bytearray(good)), (8, None),
            (9, bytearray(b"not a video")),
            # AVI magic but truncated body: decode raises loudly; the
            # dedup map must SKIP, not fail the stage
            (10, bytearray(good[: len(good) // 2]))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["frame_no"]): r["phash"]
        for r in video_phash_codes(df).collect()
    }
    assert set(got) == {(7, 0), (7, 1), (7, 2)}
    for k, block in enumerate(blocks):
        assert got[(7, k)] == phash63(block.tobytes(), 32, 32, 1)


def test_video_phash_codes_samples_every_n(spark):
    from blockchaintoavro_spark.operators.phash import video_phash_codes

    rnd = np.random.RandomState(23)
    blocks = [rnd.randint(0, 256, (32, 32)).astype(np.uint8) for _ in range(5)]
    df = spark.createDataFrame(
        [(1, bytearray(_make_dib_avi(blocks)))], "doc_id long, payload binary"
    )
    got = sorted(r["frame_no"] for r in video_phash_codes(df, every_n=2).collect())
    assert got == [0, 2, 4]


def test_video_neardup_pairs_exact_vs_brute_force(spark):
    """Any-frame matching with the distinct-f1 count must equal a
    brute-force recompute over seeded frame-code sets."""
    from blockchaintoavro_spark.operators.phash import video_neardup_pairs

    rnd = np.random.RandomState(31)
    vids = {}
    base = [int(c) for c in rnd.randint(0, 1 << 62, 3, dtype=np.int64)]
    vids[0] = list(base)
    v1 = list(base)  # near-dup of 0: flip 2 bits in one frame
    c = v1[1]
    for b in (3, 40):
        c ^= 1 << b
    v1[1] = c
    vids[1] = v1
    vids[2] = [int(c) for c in rnd.randint(0, 1 << 62, 3, dtype=np.int64)]
    vids[3] = [base[0], vids[2][1], int(rnd.randint(0, 1 << 62))]  # 1 shared
    rows = [
        (v, k, int(code))
        for v, codes in vids.items()
        for k, code in enumerate(codes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, frame_no long, phash long")
    got = sorted(
        map(tuple, video_neardup_pairs(df, max_hamming=3, min_matched_frames=2).collect())
    )
    def ham(a, b):
        return bin(a ^ b).count("1")
    brute = []
    for a in vids:
        for b in vids:
            if a >= b:
                continue
            m = sum(
                1 for ca in vids[a] if any(ham(ca, cb) <= 3 for cb in vids[b])
            )
            if m >= 2:
                brute.append((a, b, m))
    assert got == sorted(brute)
    assert (0, 1, 3) in got  # the seeded near-dup pair
    assert all(p[0:2] != (0, 3) for p in got)  # 1 shared frame < 2


def test_video_fixture_groups_match_and_groups_separate(spark):
    from blockchaintoavro_spark.operators.phash import (
        video_neardup_pairs,
        video_phash_fixture_codes,
    )

    df = spark.range(20).withColumnRenamed("id", "doc_id")
    codes = video_phash_fixture_codes(df)
    pairs = sorted(
        map(tuple, video_neardup_pairs(codes, 3, 2).collect())
    )
    want = sorted(
        (a, b, 3)
        for g in range(4)
        for a in range(g * 5, g * 5 + 5)
        for b in range(a + 1, g * 5 + 5)
    )
    assert pairs == want


def test_video_neardup_plan_is_banded_equi_join(spark):
    from blockchaintoavro_spark.operators.phash import video_neardup_pairs

    df = spark.createDataFrame(
        [(i, k, i * 977 + k) for i in range(20) for k in range(3)],
        "doc_id long, frame_no long, phash long",
    )
    pairs = video_neardup_pairs(df, max_hamming=3)
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(pairs._jdf.queryExecution(), "simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _seq_codes(spark, rows):
    """(doc_id, frame_no, phash) frame-code table from python triples."""
    return spark.createDataFrame(
        rows, "doc_id long, frame_no long, phash long"
    )


def test_video_clip_match_finds_embedded_excerpt(spark):
    """r9 VERDICT #3 done-criterion: a 10-frame excerpt embedded in a
    100-frame video is found at the correct offset; a decoy video with
    disjoint content never matches; a dropped (undecodable) corpus
    frame only removes the shingles that cross the gap."""
    from blockchaintoavro_spark.operators.phash import video_clip_matches

    code = lambda d, f: (d * 1_000_003 + f * 7_919) % (1 << 62)
    video = [(1, f, code(1, f)) for f in range(100)]
    decoy = [(2, f, code(2, f)) for f in range(100)]
    clip = [(1000, i, code(1, 20 + i)) for i in range(10)]  # frames 20..29
    got = video_clip_matches(
        _seq_codes(spark, clip), _seq_codes(spark, video + decoy), k=5
    ).collect()
    assert [(r["clip_id"], r["video_id"], r["offset"], r["n_votes"]) for r in got] == [
        (1000, 1, 20, 6)  # 10 - k + 1 = 6 aligned shingles, one offset
    ]

    # corpus loses frame 24 (mid-excerpt): shingles crossing the gap
    # must NOT form from non-adjacent codes — votes drop to the two
    # surviving contiguous runs (20..23 → 0 shingles of len 5; 25..29 →
    # one shingle at 25), below min_votes=2 → no match; with
    # min_votes=1 the surviving alignment is still at offset 20
    holed = [(1, f, code(1, f)) for f in range(100) if f != 24]
    got2 = video_clip_matches(
        _seq_codes(spark, clip), _seq_codes(spark, holed), k=5
    ).collect()
    assert got2 == []
    got3 = video_clip_matches(
        _seq_codes(spark, clip), _seq_codes(spark, holed), k=5, min_votes=1
    ).collect()
    assert [(r["video_id"], r["offset"], r["n_votes"]) for r in got3] == [(1, 20, 1)]


def test_video_clip_match_exact_vs_brute_force_and_hash_parity(spark):
    """Offset voting must equal the brute-force histogram over all
    (clip shingle, video shingle) equal-code-window pairs, and the
    8-byte hashed join key must give the same result as joining on the
    raw k-code windows. Repeated content (a looped segment) is included
    so multi-hit voting is exercised."""
    from blockchaintoavro_spark.operators.phash import video_clip_matches

    k, min_votes = 3, 1
    # video 1: a 6-frame motif repeated at 0, 10 (loop), noise between;
    # video 2: unrelated
    motif = [((i * 37) % 11) for i in range(6)]
    codes1 = {}
    for f in range(30):
        codes1[f] = 1_000 + ((f * 73) % 997)
    for s in (0, 10):
        for i, m in enumerate(motif):
            codes1[s + i] = 2_000 + m
    corpus_rows = [(1, f, c) for f, c in codes1.items()]
    corpus_rows += [(2, f, 3_000 + f) for f in range(30)]
    clip_rows = [(9, i, 2_000 + m) for i, m in enumerate(motif)]

    def shingles(rows):
        by = {}
        for d, f, c in rows:
            by.setdefault(d, {})[f] = c
        out = []
        for d, m in by.items():
            for f in m:
                win = [m.get(f + j) for j in range(k)]
                if None not in win:
                    out.append((d, f, tuple(win)))
        return out

    want = {}
    for cd, cp, cw in shingles(clip_rows):
        for vd, vp, vw in shingles(corpus_rows):
            if cw == vw:
                key = (cd, vd, vp - cp)
                want[key] = want.get(key, 0) + 1
    want = {key: n for key, n in want.items() if n >= min_votes}
    assert len(want) >= 2  # both motif occurrences align

    for hashed in (True, False):
        got = {
            (r["clip_id"], r["video_id"], r["offset"]): r["n_votes"]
            for r in video_clip_matches(
                _seq_codes(spark, clip_rows),
                _seq_codes(spark, corpus_rows),
                k=k, min_votes=min_votes, hashed=hashed,
            ).collect()
        }
        assert got == want, (hashed, got, want)

    # plan: one equi-join on the shingle key — no nested loop ever
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        video_clip_matches(
            _seq_codes(spark, clip_rows), _seq_codes(spark, corpus_rows), k=k
        )._jdf.queryExecution(),
        "simple",
    )
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_video_clip_match_robust_survives_per_frame_corruption(spark):
    """r10 VERDICT #2 done-criterion: a re-encoded clip whose EVERY
    frame code is corrupted by 2 bit flips still reports the correct
    (video, offset) — with full n_frames votes — while the exact
    shingled matcher finds nothing; the result equals the brute-force
    all-pairs Hamming histogram (pigeonhole exactness at radius <
    n_bands); and the plan stays an equi-join (never a nested loop)."""
    from blockchaintoavro_spark.operators.phash import (
        video_clip_matches,
        video_clip_matches_robust,
    )

    code = lambda d, f: d * 1_000_003 + f * 7_919
    corrupt = lambda c, i: c ^ (1 << (i % 17)) ^ (1 << (20 + (i * i) % 23))
    corpus_rows = [(v, f, code(v, f)) for v in range(10) for f in range(30)]
    # 8-frame excerpt of video 4 starting at frame 11, noisy re-encode
    clip_rows = [(1004, i, corrupt(code(4, 11 + i), i)) for i in range(8)]
    corpus = _seq_codes(spark, corpus_rows)
    clips = _seq_codes(spark, clip_rows)

    got_df = video_clip_matches_robust(
        clips, corpus, max_hamming=2, min_votes=4
    )
    got = {
        (r["clip_id"], r["video_id"], r["offset"], r["n_votes"])
        for r in got_df.collect()
    }
    assert got == {(1004, 4, 11, 8)}

    # the exact-shingle matcher is blind to this clip at ANY vote gate
    assert (
        video_clip_matches(clips, corpus, k=5, min_votes=1).count() == 0
    )

    # brute force: every (clip frame, corpus frame) pair within radius,
    # histogrammed by offset — banded result must equal it exactly
    votes: dict = {}
    for cid, cf, cc in clip_rows:
        for vid, vf, vc in corpus_rows:
            if bin(cc ^ vc).count("1") <= 2:
                key = (cid, vid, vf - cf)
                votes[key] = votes.get(key, 0) + 1
    want = {(k[0], k[1], k[2], n) for k, n in votes.items() if n >= 4}
    assert got == want

    # physical plan: band-keyed equi-join, no nested loop / cartesian
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        got_df._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" not in p and "Cartesian" not in p
