"""Vector math over ``array<float|double>`` columns.

Two families with bit-identical results (same IEEE doubles, same
left-to-right summation order):

* fold forms (``dot``/``l2_norm``/``cosine_similarity``) — JVM
  higher-order functions, zero Python; right for low-volume sites and
  as the reference semantics.
* vectorized twins (``pairwise_cosine``/``matrix_dots``/
  ``matrix_cosines``, r16) — Arrow-batched NumPy for per-pair/per-plane
  volume, where the interpreted HOF fold costs ~100 CPU-s per million
  64-dim pairs (guide §4).

Scale note (100 TB): all are narrow per-row expressions — no shuffle.
Cast to double FIRST so both engines (and any oracle) do identical
IEEE-double arithmetic with identical left-to-right summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential fold — deterministic
    summation order, matches a scalar loop)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# r16 vectorized twins (guide §4): the fold forms above are higher-order
# functions — CodegenFallback, interpreted per element, ~100 CPU-s per
# million 64-dim pairs. The arrow_udf forms below compute the SAME IEEE
# doubles in the SAME left-to-right summation order (a j-ascending
# `acc += v[:, j] * w[:, j]` over float64 is op-for-op the fold), so
# results are bit-identical — property-pinned in tests/test_operators.py
# (test_vectorized_twins_bit_match_folds). A JVM unroll was tried first
# and rejected: 48 dots x 64 dims as scalar expressions OOMs Janino.
#
# Null semantics mirrored from the folds:
#   * either vector NULL            -> NULL
#   * lengths differ (zip_with pads)-> NULL
#   * Inf, denormals, sign          -> identical IEEE propagation
# Divergences, documented (all unreachable from finite fixture data, and
# pinned in tests/test_operators.py::test_vectorized_twins_bit_match_folds):
#   * a NULL *element* inside a vector folds to NULL but arrives in
#     NumPy as NaN. No dim-guarded caller can see one (the guards raise
#     on ragged vectors and the fixtures carry none).
#   * a ZERO-norm vector: under Spark 4's default ANSI mode the fold
#     cosine RAISES DIVIDE_BY_ZERO (0.0 divisor), so no live fixture can
#     contain one; the twins return a NaN -> NULL (below) instead.
#   * a NaN RESULT (requires NaN/Inf inputs): Spark's Arrow return path
#     sanitizes NaN to NULL, so the twins yield NULL where the fold
#     yields NaN. For sign-bit assembly the two are indistinguishable
#     (`when(x >= 0)` is false for both); for ordering they differ, but
#     only NaN/Inf inputs can produce either.


def _list_view(arr):
    """(offsets int64[n+1], flat float64 values, null-row mask) of an
    arrow list array — zero-copy except null-element substitution."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.asarray(arr.offsets, dtype=np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False)  # null elem -> NaN
    nulls = np.asarray(arr.is_null())
    return offs, np.asarray(flat, dtype=np.float64), nulls


def _gather(offs, flat, rows, dim):
    """(len(rows), dim) matrix gathered from a flat list-array buffer."""
    idx = offs[rows][:, None] + np.arange(dim)[None, :]
    return flat[idx]


def pairwise_cosine(a: Column, b: Column) -> Column:
    """Vectorized twin of :func:`cosine_similarity` for per-pair rerank
    volume (LSH/IVF candidate sets): one Arrow batch in, a j-ascending
    accumulation across the batch, bit-identical doubles out."""

    @F.arrow_udf("double")
    def _cos(va: pa.Array, vb: pa.Array) -> pa.Array:
        oa, fa, na = _list_view(va)
        ob, fb, nb = _list_view(vb)
        n = len(oa) - 1
        la = oa[1:] - oa[:-1]
        lb = ob[1:] - ob[:-1]
        valid = ~na & ~nb & (la == lb)
        out = np.zeros(n, dtype=np.float64)
        for d in np.unique(la[valid]):
            rows = np.flatnonzero(valid & (la == d))
            VA = _gather(oa, fa, rows, d)
            VB = _gather(ob, fb, rows, d)
            dt = np.zeros(len(rows))
            n1 = np.zeros(len(rows))
            n2 = np.zeros(len(rows))
            for j in range(d):
                dt += VA[:, j] * VB[:, j]
                n1 += VA[:, j] * VA[:, j]
                n2 += VB[:, j] * VB[:, j]
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                out[rows] = dt / (np.sqrt(n1) * np.sqrt(n2))
        return pa.array(out, type=pa.float64(), mask=~valid)

    return _cos(_as_double(a), _as_double(b))


def _matrix_scores(vec: Column, matrix, cosine: bool) -> Column:
    P = np.asarray(matrix, dtype=np.float64)  # (K, dim)
    K, dim = P.shape
    if cosine:
        pn = np.zeros(K)
        for j in range(dim):
            pn += P[:, j] * P[:, j]
        pn = np.sqrt(pn)

    @F.arrow_udf("array<double>")
    def _scores(vs: pa.Array) -> pa.Array:
        offs, flat, nulls = _list_view(vs)
        n = len(offs) - 1
        lens = offs[1:] - offs[:-1]
        valid = ~nulls & (lens == dim)
        D = np.zeros((n, K), dtype=np.float64)
        rows = np.flatnonzero(valid)
        if len(rows):
            V = _gather(offs, flat, rows, dim)
            S = np.zeros((len(rows), K))
            for j in range(dim):
                S += V[:, j : j + 1] * P[:, j]
            if cosine:
                vn = np.zeros(len(rows))
                for j in range(dim):
                    vn += V[:, j] * V[:, j]
                with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                    S = S / (np.sqrt(vn)[:, None] * pn[None, :])
            D[rows] = S
        elem_mask = np.repeat(~valid, K)
        values = pa.array(D.ravel(), type=pa.float64(), mask=elem_mask)
        out_offs = pa.array(np.arange(n + 1, dtype=np.int32) * K, type=pa.int32())
        return pa.ListArray.from_arrays(out_offs, values)

    return _scores(_as_double(vec))


def matrix_dots(vec: Column, matrix) -> Column:
    """``array<double>`` of :func:`dot`\\ (vec, row) for every row of the
    literal ``matrix`` (K x dim) — the one-pass twin of K separate fold
    dots (LSH hyperplane signing). NULL / ragged vector -> K NULLs, the
    folds' per-plane result."""
    return _matrix_scores(vec, matrix, cosine=False)


def matrix_cosines(vec: Column, matrix) -> Column:
    """``array<double>`` of :func:`cosine_similarity`\\ (vec, row) per
    ``matrix`` row — the one-pass twin of the per-centroid fold scores
    (IVF assignment/probe)."""
    return _matrix_scores(vec, matrix, cosine=True)
