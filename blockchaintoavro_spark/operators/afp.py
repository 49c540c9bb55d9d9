"""Perceptual AUDIO near-duplicate detection — a Haitsma-Kalker-style
band-energy-difference fingerprint over decoded PCM plus the same
Hamming-banded candidate join the image pHash uses (completes the
multimodal dedup family: text MinHash → image pHash → audio AFP).

Reference scope: the reference pipeline (cobookman/blockchainToAvro)
has no audio handling at all — this operator family belongs to the
LLM-training-data mandate (BASELINE.json), built on the repo's own WAV
codec (functions/audio.py).

Algorithm (public construction, after Haitsma & Kalker 2002 "A Highly
Robust Audio Fingerprinting System": fingerprint bits are the signs of
TIME-DELTA of BAND-ENERGY-DELTAS, which is what makes the code robust
to level changes — any monotone per-clip gain shift preserves every
sign):

1. decode the payload (magic dispatch — WAV PCM/G.711) to interleaved
   int16 samples; multi-channel mixes to mono by per-frame SUM
   (integer, sign-preserving — no division, so there is no floor-vs-
   trunc ambiguity between engines);
2. split the clip into **9 equal time blocks** (floor boundaries);
   within each block, SUM-pool the samples into **64 cells** (again no
   division: pooling is linear, and the fingerprint only compares
   energy differences, so a uniform scale cannot flip a bit);
3. per block, a 64-point **Walsh-Hadamard transform** in natural
   (Hadamard) order — ``W[c] = Σ_j cell[j]·(−1)^popcount(c AND j)`` —
   the classic integer-exact spectral substitute (sequency domain);
   coefficient 0 is DC and is skipped;
4. **9 band energies** per block: band ``b`` = coefficients
   ``1+7b .. 7+7b``, ``E[t][b] = Σ W²`` (exact Python ints — no
   overflow at any clip length);
5. the **63-bit code**: for ``t = 1..8`` and ``b = 0..7``, bit
   ``(t−1)·8 + b`` is set iff
   ``(E[t][b]−E[t][b+1]) − (E[t−1][b]−E[t−1][b+1]) > 0``;
   bit 63 of the 8×8 grid is dropped so the code stays non-negative in
   an int64 (the pHash convention, operators/phash.py).

Everything is integer end-to-end, so a SQL oracle replicates the whole
decode→pool→WHT→energy→threshold pipeline with plain arithmetic — the
x_afp_codes declared query hash-checks it against DuckDB.

Near-dup retrieval REUSES :func:`operators.phash.phash_neardup_pairs`
verbatim (the code is just an int64 column): 4×16-bit disjoint bands,
pigeonhole-exact for Hamming ≤ 3, banded equi-join + bit_count(xor)
verify — never all-pairs.

Scale: code extraction is an embarrassingly parallel Arrow-batched map
(one int64 per clip); dedup state is 8 bytes × n_clips — the same
posture as MinHash and pHash at 100 TB.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: 64×64 Walsh-Hadamard matrix in natural (Hadamard) order:
#: H[c, j] = (−1)^popcount(c AND j). Built once per process; 32 KB.
_WHT64: np.ndarray | None = None

N_BLOCKS = 9
N_CELLS = 64


def _wht_matrix() -> np.ndarray:
    global _WHT64
    if _WHT64 is None:
        idx = np.arange(64, dtype=np.uint32)
        pop = np.array(
            [bin(c & j).count("1") for c in idx for j in idx], dtype=np.int64
        ).reshape(64, 64)
        _WHT64 = 1 - 2 * (pop % 2)
    return _WHT64


#: largest |W| coefficient for which the whole energy/threshold pipeline
#: provably fits in int64: the worst intermediate is the second-order
#: energy delta |q| ≤ 4·(7·mx²) = 28·mx², so mx ≤ isqrt((2^63−1)/28).
#: Clips above this (≈5.7e8 — beyond any real PCM block) take the exact
#: big-int fallback; below it the vectorized path is bit-identical by
#: construction (integer math, no rounding, no overflow).
import math as _math

_AFP_FAST_MAX_W = _math.isqrt(((1 << 63) - 1) // 28)


def afp63(samples: list[int] | np.ndarray, channels: int = 1) -> int:
    """63-bit perceptual audio fingerprint of one decoded clip (see
    module docstring). Deterministic and integer-exact: sum pooling,
    integer WHT, exact big-int energies, strict ``> 0`` thresholds.
    A silent (all-equal) clip has all-zero energy deltas → code 0; an
    empty clip → 0."""
    x = np.asarray(samples, dtype=np.int64)
    if channels > 1:
        n_frames = x.size // channels
        x = x[: n_frames * channels].reshape(n_frames, channels).sum(axis=1)
    n = x.size
    if n == 0:
        return 0
    H = _wht_matrix()
    # pool every block's 64 cells in one pass off a shared prefix sum
    # (identical floor boundaries: cell j of block t spans
    # [lo + j·m//64, lo + (j+1)·m//64) — integer sums, order-free)
    csum = np.concatenate(([0], np.cumsum(x)))
    cells = np.zeros((N_BLOCKS, N_CELLS), dtype=np.int64)
    cell_idx = np.arange(N_CELLS + 1, dtype=np.int64)
    for t in range(N_BLOCKS):
        lo, hi = t * n // N_BLOCKS, (t + 1) * n // N_BLOCKS
        m = hi - lo
        if m:
            bounds = lo + (cell_idx * m) // N_CELLS
            cells[t] = csum[bounds[1:]] - csum[bounds[:-1]]
    # W[t, c] = Σ_j H[c,j]·cells[t,j] — H is symmetric, so cells @ H
    # equals the per-block H @ cells; |W| ≤ 64·|cell|, int64-safe for
    # any real clip (same exposure as the original per-block form)
    W = cells @ H
    mx = int(np.abs(W).max())
    if mx <= _AFP_FAST_MAX_W:
        # vectorized int64 path — provably overflow-free (see
        # _AFP_FAST_MAX_W), so bit-identical to the big-int fallback
        W2 = W * W
        E = W2[:, 1:64].reshape(N_BLOCKS, 9, 7).sum(axis=2)
        D = E[:, :8] - E[:, 1:9]
        Q = (D[1:] - D[:-1]).reshape(64)
        bits = (Q[:63] > 0).astype(np.uint64)
        return int((bits << np.arange(63, dtype=np.uint64)).sum())
    # exact big-int fallback for pathological amplitudes
    Ee = []  # E[t][b], exact Python ints
    for t in range(N_BLOCKS):
        Wp = [int(w) for w in W[t]]
        Ee.append(
            [
                sum(Wp[1 + 7 * b + k] ** 2 for k in range(7))
                for b in range(9)
            ]
        )
    code = 0
    for t in range(1, 9):
        for b in range(8):
            bit = (t - 1) * 8 + b
            if bit > 62:
                continue
            q = (Ee[t][b] - Ee[t][b + 1]) - (Ee[t - 1][b] - Ee[t - 1][b + 1])
            if q > 0:
                code |= 1 << bit
    return code


def afp_codes(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio fingerprint per clip payload: ``(id, afp long)`` via one
    Arrow-batched map over the binary column (magic-dispatch WAV decode
    → mono sum-mix → block/band energies → sign code). Undecodable,
    CORRUPT and NULL payloads are all dropped — ``try_decode_audio``
    raises loudly on WAV-magic-but-corrupt bytes (the QA contract of
    operators/multimodal.py), but a dedup stage over 100 TB must not
    die on one mangled clip, so the corrupt-data error set is caught
    here (the imaging totality convention,
    functions/imaging.py:try_decode_image)."""
    from blockchaintoavro_spark.functions.audio import try_decode_audio

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, codes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    d = try_decode_audio(bytes(payload))
                except (ValueError, IndexError, struct.error):
                    continue  # corrupt magic-matched payload
                if d is None:
                    continue
                codes.append(afp63(d["samples"], d["channels"]))
                ids.append(i)
            yield pd.DataFrame({id_col: ids, "afp": pd.array(codes, dtype="int64")})

    out_schema = df.select(id_col).schema.add("afp", "long")
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def afp_neardup_pairs(
    codes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    code_col: str = "afp",
    n_bands: int = 4,
) -> DataFrame:
    """All clip pairs within Hamming radius ``max_hamming`` — EXACT for
    ``max_hamming < n_bands`` by the pigeonhole banding argument. The
    plan IS :func:`operators.phash.phash_neardup_pairs` (a 64-bit code
    is a 64-bit code): banded equi-join + bit_count(xor) verify, never
    a cartesian product."""
    from blockchaintoavro_spark.operators.phash import phash_neardup_pairs

    return phash_neardup_pairs(
        codes, max_hamming, id_col=id_col, code_col=code_col, n_bands=n_bands
    )


def afp_codes_windowed(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window_samples: int = 8192,
    hop_samples: int = 4096,
) -> DataFrame:
    """Fingerprint STREAM per clip: one 63-bit AFP code per hop-aligned
    window of the decoded mono samples — ``(id, frame_no, afp)`` with
    ``frame_no`` the window index. This is the Shazam-shaped layout
    (Haitsma & Kalker 2002 §III extract sub-fingerprints per frame, not
    one per clip) that turns audio CLIP-IN-CLIP search into the
    frame-code problem the video machinery already solves end to end:
    feed the output to ``phash.video_clip_matches`` for shingled
    offset-voting alignment ("this 10 s excerpt starts 80 s into that
    recording"), or band the codes into the standing hamming near-dup
    index for daily-ingest audio dedup.

    Offsets come back in WINDOW units (× ``hop_samples`` = sample
    offset). Exact matching needs the excerpt cut on the hop grid of
    the source — shrink ``hop_samples`` to tighten the alignment
    granularity (cost is linear in 1/hop). Same totality contract as
    :func:`afp_codes`: undecodable/NULL payloads drop. One
    embarrassingly parallel Arrow map; fingerprint state is 8 bytes per
    window."""
    from blockchaintoavro_spark.functions.audio import try_decode_audio

    if hop_samples <= 0 or window_samples <= 0:
        raise ValueError("window_samples and hop_samples must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, codes = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    d = try_decode_audio(bytes(payload))
                except (ValueError, IndexError, struct.error):
                    continue
                if d is None:
                    continue
                x = np.asarray(d["samples"], dtype=np.int64)
                ch = d["channels"]
                if ch > 1:
                    n_frames = x.size // ch
                    x = x[: n_frames * ch].reshape(n_frames, ch).sum(axis=1)
                w = 0
                start = 0
                while start + window_samples <= x.size:
                    codes.append(afp63(x[start : start + window_samples]))
                    ids.append(i)
                    frame_nos.append(w)
                    w += 1
                    start += hop_samples
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_no": pd.array(frame_nos, dtype="int64"),
                    "afp": pd.array(codes, dtype="int64"),
                }
            )

    out_schema = (
        df.select(id_col).schema.add("frame_no", "long").add("afp", "long")
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def audio_clip_matches(
    clips: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    min_votes: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window_samples: int = 8192,
    hop_samples: int = 4096,
    hashed: bool = True,
) -> DataFrame:
    """Where does each audio clip occur inside which corpus recording?
    ``(clip_id, video_id→recording id, offset, n_votes)`` with
    ``offset`` in hop units. Pure composition: windowed AFP codes on
    both sides (:func:`afp_codes_windowed`), then the video shingle +
    offset-voting matcher verbatim — one equi-join, never all-pairs."""
    from blockchaintoavro_spark.operators.phash import video_clip_matches

    cw = afp_codes_windowed(
        clips, payload_col, id_col, window_samples, hop_samples
    )
    vw = afp_codes_windowed(
        corpus, payload_col, id_col, window_samples, hop_samples
    )
    return video_clip_matches(
        cw, vw, k=k, min_votes=min_votes,
        id_col=id_col, code_col="afp", hashed=hashed,
    )


def audio_clip_matches_robust(
    clips: DataFrame,
    corpus: DataFrame,
    max_hamming: int = 2,
    min_votes: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window_samples: int = 8192,
    hop_samples: int = 4096,
    n_bands: int = 4,
) -> DataFrame:
    """Audio clip-in-clip alignment that survives RE-ENCODING
    (:func:`audio_clip_matches` needs every one of ``k`` consecutive
    window codes verbatim; a transcoded clip wobbles a few AFP bits per
    window and never shingles). Same composition, robust matcher:
    windowed AFP codes on both sides, then per-window banded Hamming
    candidates + offset voting (``phash.video_clip_matches_robust`` —
    exact at radius ``max_hamming < n_bands`` by pigeonhole). Returns
    ``(clip_id, video_id→recording id, offset, n_votes)``, offsets in
    hop units; a clean n-window excerpt collects all n votes."""
    from blockchaintoavro_spark.operators.phash import (
        video_clip_matches_robust,
    )

    cw = afp_codes_windowed(
        clips, payload_col, id_col, window_samples, hop_samples
    )
    vw = afp_codes_windowed(
        corpus, payload_col, id_col, window_samples, hop_samples
    )
    return video_clip_matches_robust(
        cw, vw, max_hamming=max_hamming, min_votes=min_votes,
        id_col=id_col, code_col="afp", n_bands=n_bands,
    )


# ---------------------------------------------------------------------------
# deterministic fixture: synthesized WAV corpus whose fingerprint a SQL
# oracle can recompute (the x_afp_codes / x_afp_neardup declared queries)

FIXTURE_SAMPLES = 1152  # 9 blocks × 64 cells × 2 samples — sum-pool of
#                         exactly two samples per cell, SQL-replicable


def afp_fixture_codes(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Run the REAL audio-fingerprint pipeline end-to-end on a
    synthesized corpus: per id, a deterministic 1152-sample mono PCM
    clip — with ``g = id//5``, ``r = id%5``:

    ``s[i] = (g·131 + 17·i + (i·i) % (101 + (g·53) % 151)) % 32768 −
    16384``, plus ``r·64`` at position ``r·7+1``.

    The GROUP-dependent quadratic modulus changes the spectral
    character per base clip (measured: across-group Hamming ≥ 18), so
    only the five perturbed variants of a base are near-dups (within-
    group Hamming 0–5, some beyond radius 3 — the verify filter does
    real work) and the pair output stays LINEAR in corpus size instead
    of the fixture accidentally making everything a candidate. Every
    operand is non-negative before the final subtraction, so Python
    and SQL ``%``/``//`` agree. The clip is encoded to real RIFF/WAVE
    bytes and decoded back through magic dispatch before
    fingerprinting — every decoded sample is id arithmetic, so DuckDB
    verifies the entire encode→decode→pool→WHT→energy→threshold
    pipeline with no audio code."""
    from blockchaintoavro_spark.functions.audio import (
        encode_wav,
        try_decode_audio,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i_arr = np.arange(FIXTURE_SAMPLES, dtype=np.int64)
        for pdf in batches:
            ids, codes = [], []
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                g, r = doc_id // 5, doc_id % 5
                m = 101 + (g * 53) % 151
                s = (g * 131 + 17 * i_arr + (i_arr * i_arr) % m) % 32768 - 16384
                s[r * 7 + 1] += r * 64
                payload = encode_wav(8000, 1, s.tolist(), 16)
                d = try_decode_audio(payload)
                codes.append(afp63(d["samples"], d["channels"]))
                ids.append(doc_id)
            yield pd.DataFrame(
                {id_col: ids, "afp": pd.array(codes, dtype="int64")}
            )

    out_schema = df.select(id_col).schema.add("afp", "long")
    # r16: payloads are synthesized from the id alone, so only the id
    # enters the Python stage — spread the ids first or a single-file
    # scan runs the whole pure-Python WAV+WHT pipeline serially in one
    # task (measured wall ≈ CPU ≈ 7 s at sf0.1)
    from .multimodal import _spread_ids

    return _spread_ids(df, id_col).mapInPandas(run, schema=out_schema)
