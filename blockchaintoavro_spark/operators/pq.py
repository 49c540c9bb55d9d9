"""Product quantization (PQ) for the embedding store — Jégou et al.
2011, the standard memory-bounded ANN representation: each vector is
split into ``m`` subvectors, each subvector is replaced by the id of its
nearest per-subspace centroid, and search scores COMPRESSED codes via
per-query lookup tables (asymmetric distance computation, ADC) without
ever touching the original floats.

Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its
``m=8`` one-byte codes are 8 bytes — a 32× smaller scan surface for the
brute-force leg, and the codebooks (``m × n_codes × d/m`` floats, KBs)
are model parameters, not data. The operators follow the engine's
bounded-model idiom: training iterates Lloyd per subspace with ALL
subspaces batched into one job per iteration (one bounded-key shuffle of
``m · n_codes · d/m`` cells), encoding is a narrow codegen'd map against
codebook literals, and ADC search is a broadcast of the (tiny) query
side over the code table with a per-query partial top-k.

Like the LSH/IVF family, the trained codebooks are engine-defined
(iterative float means), so the declared query is rows-only and quality
is pinned by recall tests against the exact oracle instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import _list_view
from ..session import tiny_df
from . import manifest as mf

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_topk",
    "train_ivfpq",
    "ivfpq_encode",
    "ivfpq_topk",
    "build_ivfpq_index",
    "query_ivfpq",
    "read_ivfpq_codes",
    "append_to_ivfpq_index",
]

# pre-r11 on-disk layout of a persisted IVFADC index, adopted on the
# first manifest commit
_IVFPQ_LEGACY = {
    "segments": ["codes"],
    "refs": {"centroids": "centroids", "codebooks": "codebooks"},
}


def _subspace_slices(vec: Column, m: int, dsub: int) -> Column:
    """array<array<double>> of the vector's m contiguous subvectors."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.slice(vec, s * dsub + 1, dsub),
    )


def _nearest_codes(vec: Column, codebooks, centroids=None) -> Column:
    """``array<int>`` of the nearest per-subspace code for every
    subvector — the r16 Arrow-batched twin of the per-subspace
    ``array_min(transform(...fold...))`` tree (guide §4), bit-identical
    distances in identical j-ascending summation order, ties to the
    lowest code (``argmin`` first-occurrence == the fold's
    ``array_min`` struct ordering).

    With ``centroids``/a ``cid`` column (pass ``vec`` as a 2-tuple
    ``(v, cid)``), codes quantize the RESIDUAL ``v − centroids[cid]``
    (elementwise subtraction, same order as the fold's ``zip_with``).

    Edge semantics mirrored from the fold tree: a NULL vector or a
    subspace the vector is too short for codes to 0 (the fold's NULL
    distance sorts first at code 0). NaN inputs diverge per the
    functions/vectors.py NaN note (unreachable from finite fixtures).
    """
    B = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
    m, K, dsub = B.shape
    C = None if centroids is None else np.asarray(centroids, dtype=np.float64)

    def _codes_np(offs, flat, nulls, cids=None):
        n = len(offs) - 1
        lens = offs[1:] - offs[:-1]
        codes = np.zeros((n, m), dtype=np.int32)
        for s in range(m):
            ok = ~nulls & (lens >= (s + 1) * dsub)
            rows = np.flatnonzero(ok)
            if not len(rows):
                continue
            idx = (offs[rows] + s * dsub)[:, None] + np.arange(dsub)[None, :]
            V = flat[idx]
            if cids is not None:
                V = V - C[cids[rows]][:, s * dsub : (s + 1) * dsub]
            D = np.zeros((len(rows), K))
            for j in range(dsub):
                d = V[:, j : j + 1] - B[s, :, j]
                D += d * d
            codes[rows, s] = np.argmin(D, axis=1)
        values = pa.array(codes.ravel(), type=pa.int32())
        out_offs = pa.array(
            np.arange(n + 1, dtype=np.int32) * m, type=pa.int32()
        )
        return pa.ListArray.from_arrays(out_offs, values)

    if C is None:

        @F.arrow_udf("array<int>")
        def _codes(vs: pa.Array) -> pa.Array:
            return _codes_np(*_list_view(vs))

        return _codes(vec.cast("array<double>"))

    v, cid = vec

    @F.arrow_udf("array<int>")
    def _codes_resid(vs: pa.Array, cs: pa.Array) -> pa.Array:
        if isinstance(cs, pa.ChunkedArray):
            cs = cs.combine_chunks()
        offs, flat, nulls = _list_view(vs)
        # a NULL cid NULLs the fold's residual -> codes 0, same as a
        # NULL vector
        nulls = nulls | np.asarray(cs.is_null())
        cids = np.asarray(cs.fill_null(0), dtype=np.int64)
        return _codes_np(offs, flat, nulls, cids=cids)

    return _codes_resid(v.cast("array<double>"), cid.cast("long"))


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train the ``m`` per-subspace codebooks (``n_codes`` centroids of
    dim ``d/m`` each) by Lloyd iterations over ALL subspaces at once:
    one exploded ``(sub_id, subvec)`` frame, assignment via codebook
    literals, update via one ``groupBy(sub_id, code, pos)`` mean whose
    output is ``m·n_codes·d/m`` cells — the only thing the driver ever
    holds. Deterministic: init from the first rows by id, ties to the
    lowest code, empty cells keep their previous centroid.

    Returns ``codebooks[sub_id][code] -> list[float]``.
    """
    dim = len(
        corpus.select(F.col(vec_col).alias("e")).first()["e"]
    )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    v = F.col(vec_col).cast("array<double>")

    seed_rows = (
        corpus.select(v.alias("e")).orderBy(id_col).limit(n_codes).collect()
    )
    if not seed_rows:
        raise ValueError("empty corpus")
    codebooks = [
        [
            [float(x) for x in r["e"][s * dsub : (s + 1) * dsub]]
            for r in seed_rows
        ]
        for s in range(m)
    ]
    # fewer seed rows than codes: pad by repeating (harmless — dead codes)
    while len(codebooks[0]) < n_codes:
        for s in range(m):
            codebooks[s].append(list(codebooks[s][-1]))

    for _ in range(n_iters):
        # r16: assignment is Arrow-batched over the FULL vector before
        # the explode (bit-identical distances — _nearest_codes), so the
        # per-subvector interpreted fold tree is gone; sub_id comes from
        # the zip position exactly as the old posexplode gave it
        assigned = corpus.select(
            F.posexplode(
                F.arrays_zip(
                    _subspace_slices(v, m, dsub).alias("sub"),
                    _nearest_codes(v, codebooks).alias("code"),
                )
            ).alias("sub_id", "z")
        ).select(
            "sub_id",
            F.col("z.sub").alias("sub"),
            F.col("z.code").alias("code"),
        )
        means = (
            assigned.select(
                "sub_id", "code", F.posexplode("sub").alias("pos", "x")
            )
            .groupBy("sub_id", "code", "pos")
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        new = [[list(c) for c in book] for book in codebooks]
        for r in means:
            new[r["sub_id"]][r["code"]][r["pos"]] = r["mval"]
        codebooks = new
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Replace each vector by its ``m`` nearest-centroid codes:
    ``(id, codes array<int>, norm double)`` — the 32×-smaller scan
    surface ADC search reads. ``norm`` is the RECONSTRUCTED vector's
    L2 norm (computable from the codes alone; carried as one double so
    cosine scoring needs no lookup at query time). Zero-shuffle narrow
    map against codebook literals."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    sqnorms = [
        [sum(x * x for x in c) for c in book] for book in codebooks
    ]
    sq_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in sqnorms]
    )
    # bind the m×n_codes×dsub codebook literal ONCE (r9 ADVICE); past
    # the float gate it rides a one-row broadcast MODEL frame instead,
    # so the main plan carries a column reference, not an O(model)
    # literal tree per use site (r11 — same trade as
    # similarity._with_centroid_scores)
    n_floats = m * len(codebooks[0]) * dsub
    if n_floats <= _BOOKS_LITERAL_MAX_FLOATS:
        src, sq_books = corpus, sq_lit
    else:
        model = corpus.sparkSession.range(1).select(sq_lit.alias("_sqb"))
        src = corpus.join(F.broadcast(model))
        sq_books = F.col("_sqb")
    # r16: nearest-code search is Arrow-batched (bit-identical distances
    # — _nearest_codes); the codebook floats ride the UDF closure as one
    # NumPy array either side of the literal gate, so only the (tiny)
    # squared-norm table still needs the literal/model branch for the
    # JVM norm fold below
    codes = _nearest_codes(v, codebooks)
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("codes"),
                sq_books,
                lambda code, row: F.element_at(row, code + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        src.withColumn("codes", codes)
        .withColumn("norm", norm)
        .select(F.col(id_col), "codes", "norm")
    )


# past this many total codebook floats (m × n_codes × dsub, plus the
# coarse centroids for IVFADC) the model leaves the expression tree and
# rides a one-row broadcast frame — a production PQ at n_codes=256
# would otherwise inline tens of thousands of literal nodes per use site
_BOOKS_LITERAL_MAX_FLOATS = 8192


def _books_lit(codebooks: list[list[list[float]]]) -> Column:
    return F.array(
        *[
            F.array(
                *[F.array(*[F.lit(float(x)) for x in c]) for c in book]
            )
            for book in codebooks
        ]
    )


def _adc_lut(qv: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table: ``lut[s][j] = dot(q_s, book_s[j])``
    as one row-local array expression over the codebook literals."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    books = _books_lit(codebooks)  # bound once, shared (r9 ADVICE)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.transform(
            F.element_at(books, s + 1),
            lambda cv: F.aggregate(
                F.zip_with(
                    F.slice(qv, s * dsub + 1, dsub), cv, lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )


def _adc_dot(codes: Column, lut: Column) -> Column:
    """``Σ_s lut[s][codes[s]]`` — the compressed-domain dot product."""
    return F.aggregate(
        F.zip_with(
            codes, lut, lambda code, row: F.element_at(row, code + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int = 32,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC: each query
    precomputes its ``m × n_codes`` dot-product lookup table ONCE (a
    row-local array expression over the codebook literals), then every
    code row scores as ``Σ_s lut[s][code_s] / (|q|·|x̂|)`` — never
    touching a corpus float. The query side (with its tables) is
    broadcast; scoring is a narrow map over the code table; per-query
    partial top-k finishes it. Returns ``(q_id, neighbor_id, sim)``.

    ADC score error scrambles rankings inside tight clusters (the
    quantization cells are coarser than the true neighbor gaps), so
    pass ``rerank_with=corpus`` for the paper's ADC+R variant: the per-
    query ADC SHORTLIST (``shortlist`` ≥ k candidates — the cheap
    compressed-scan leg) joins back to the full vectors for an EXACT
    cosine top-k over ``shortlist × n_queries`` rows only. ``sim`` is
    then the exact cosine.

    At 100 TB the scan reads ``m`` bytes + one double per corpus row —
    the point of PQ — the rerank touches a shortlist-sized sliver, and
    recall is tuned by ``m``/``n_codes``/``shortlist`` (pinned by the
    recall tests, as for LSH/IVF)."""
    qv = F.col(vec_col).cast("array<double>")
    qnorm = F.sqrt(
        F.aggregate(qv, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        _adc_lut(qv, codebooks).alias("_lut"),
        qnorm.alias("_qn"),
    )
    dot = _adc_dot(F.col("codes"), F.col("_lut"))
    cand = (
        encoded.join(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("neighbor_id"),
            (
                dot
                / F.when(
                    F.col("_qn") * F.col("norm") > 0,
                    F.col("_qn") * F.col("norm"),
                ).otherwise(F.lit(1.0))
            ).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    if rerank_with is None:
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} < k {k}")
    short = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("q_id", "neighbor_id")
    )
    from ..functions.vectors import cosine_similarity

    cv = F.col(vec_col).cast("array<double>")
    full = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), cv.alias("_cv")
    )
    qfull = queries.select(F.col(id_col).alias("q_id"), cv.alias("_qv"))
    exact = (
        short.join(full, "neighbor_id")
        .join(F.broadcast(qfull), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_cv")).alias("sim"),
        )
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _cent_lit(centroids: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def train_ivfpq(
    corpus: DataFrame,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVFADC pair (Jégou et al. 2011 §V): coarse IVF
    centroids first, then PQ codebooks on the RESIDUALS ``x − c(x)``
    (one shared residual codebook set across lists, the paper's
    memory-practical variant). Residual energy is much smaller than
    vector energy, so the same code budget quantizes far finer than
    global PQ. Both trainers are the existing bounded-model loops; the
    residual frame is a narrow projection between them."""
    from .similarity import _centroid_scores, train_ivf_centroids

    centroids = train_ivf_centroids(
        corpus, n_centroids, n_iters, id_col, vec_col
    )
    v = F.col(vec_col).cast("array<double>")
    cid = F.array_min(_centroid_scores(v, centroids))["cid"]
    resid = corpus.select(
        F.col(id_col),
        F.zip_with(
            v,
            F.element_at(_cent_lit(centroids), cid + 1),
            lambda a, b: a - b,
        ).alias("_resid"),
    )
    books = pq_train(
        resid, m=m, n_codes=n_codes, n_iters=n_iters,
        id_col=id_col, vec_col="_resid",
    )
    return centroids, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC storage row per vector: ``(id, cid, codes, norm)`` where
    ``codes`` quantize the residual ``x − c_cid`` and ``norm`` is the
    RECONSTRUCTION's L2 norm ``|c_cid + r̂|`` (exact from model
    parameters — needed for cosine ADC, and not decomposable into
    per-subspace tables because of the ``c·r̂`` cross term, so it is
    computed once here). Zero-shuffle narrow map."""
    from .similarity import _with_centroid_scores

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    v = F.col("_v")
    # literals bound ONCE (r9 ADVICE); past the float gate the whole
    # model (codebooks + coarse centroids) rides a one-row broadcast
    # frame so the main tree references columns, not literal arrays,
    # at BOTH the encode and reconstruction sites (r11)
    n_floats = m * len(codebooks[0]) * dsub + len(centroids) * len(
        centroids[0]
    )
    if n_floats <= _BOOKS_LITERAL_MAX_FLOATS:
        books, cent_arr, model = _books_lit(codebooks), _cent_lit(centroids), None
    else:
        model = corpus.sparkSession.range(1).select(
            _books_lit(codebooks).alias("_books"),
            _cent_lit(centroids).alias("_cents"),
        )
        books, cent_arr = F.col("_books"), F.col("_cents")
    cent = F.element_at(cent_arr, F.col("cid") + 1)
    # r16: residual subtraction + nearest-code search are one
    # Arrow-batched pass (bit-identical — _nearest_codes residual form);
    # the reconstruction-norm fold below stays JVM (m lookups + one
    # dim-length fold per row)
    codes = _nearest_codes((v, F.col("cid")), codebooks, centroids=centroids)
    rhat = F.flatten(
        F.zip_with(
            F.col("codes"),
            books,
            lambda code, book: F.element_at(book, code + 1),
        )
    )
    recon_norm = F.sqrt(
        F.aggregate(
            F.zip_with(rhat, cent, lambda r, c: (r + c) * (r + c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    base = _with_centroid_scores(base, v, centroids, "_sc")
    base = base.withColumn("cid", F.array_min(F.col("_sc"))["cid"]).drop(
        "_sc"
    )
    if model is not None:
        base = base.join(F.broadcast(model))
    return (
        base.withColumn("codes", codes)
        .withColumn("norm", recon_norm)
        .select(id_col, "cid", "codes", "norm")
    )


def ivfpq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int = 32,
) -> DataFrame:
    """IVFADC search: each query explodes to its ``nprobe`` nearest
    lists (carrying ONE shared residual lookup table — residual
    codebooks are cid-independent, so the lut is built once per query,
    not per probe) and scores only those lists' code rows as
    ``(dot(q, c_cid) + Σ_s lut[s][code_s]) / (|q|·|x̂|)``. The probe
    side broadcasts; the equi-join on ``cid`` prunes the corpus to
    ~``nprobe/n_centroids`` of its rows — at cluster scale persist
    ``encoded`` partitioned by ``cid`` so probes prune whole files.
    ``rerank_with`` adds the ADC+R exact re-rank leg exactly as
    :func:`pq_topk`."""
    from .similarity import _centroid_scores
    from ..functions.vectors import cosine_similarity

    qv = F.col(vec_col).cast("array<double>")
    qnorm = F.sqrt(F.aggregate(qv, F.lit(0.0), lambda acc, x: acc + x * x))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        qv.alias("_qv"),
        _adc_lut(qv, codebooks).alias("_lut"),
        qnorm.alias("_qn"),
    ).withColumn(
        "cid",
        F.explode(
            F.transform(
                F.slice(
                    F.array_sort(_centroid_scores(F.col("_qv"), centroids)),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ),
    )
    dot_qc = F.aggregate(
        F.zip_with(
            F.col("_qv"),
            F.element_at(_cent_lit(centroids), F.col("cid") + 1),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        encoded.join(F.broadcast(q), "cid")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            F.col(id_col).alias("neighbor_id"),
            (
                (dot_qc + _adc_dot(F.col("codes"), F.col("_lut")))
                / F.when(
                    F.col("_qn") * F.col("norm") > 0,
                    F.col("_qn") * F.col("norm"),
                ).otherwise(F.lit(1.0))
            ).alias("sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    ranked = cand.withColumn("rn", F.row_number().over(w))
    if rerank_with is None:
        return ranked.filter(F.col("rn") <= k).drop("rn")
    if shortlist < k:
        raise ValueError(f"shortlist {shortlist} < k {k}")
    short = ranked.filter(F.col("rn") <= shortlist).select(
        "q_id", "neighbor_id"
    )
    cv = F.col(vec_col).cast("array<double>")
    full = rerank_with.select(
        F.col(id_col).alias("neighbor_id"), cv.alias("_cv")
    )
    qfull = queries.select(F.col(id_col).alias("q_id"), cv.alias("_qv2"))
    exact = (
        short.join(full, "neighbor_id")
        .join(F.broadcast(qfull), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv2"), F.col("_cv")).alias("sim"),
        )
    )
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train and persist the IVFADC index ONCE (the :func:`query_ivf`
    amortization argument, applied to the compressed layout):
    ``{path}/centroids`` and ``{path}/codebooks`` hold the KB-sized
    models; ``{path}/codes`` holds the corpus as ``(id, codes, norm)``
    PARTITIONED BY ``cid`` — at 100 TB this is the ~32×-smaller
    artifact the whole design exists for, and a probe's equi-join
    prunes to the probed list directories. The full vectors are
    deliberately NOT in the index (re-rank against the source table
    when ADC+R is wanted)."""
    centroids, books = train_ivfpq(
        corpus, n_centroids, m, n_codes, n_iters, id_col, vec_col
    )
    spark = corpus.sparkSession
    cent_dir = mf.new_ref_name("cent")
    books_dir = mf.new_ref_name("books")
    tiny_df(
        spark,
        [(i, c) for i, c in enumerate(centroids)],
        "cid int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{index_path}/{cent_dir}")
    tiny_df(
        spark,
        [
            (s, j, c)
            for s, book in enumerate(books)
            for j, c in enumerate(book)
        ],
        "sub_id int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/{books_dir}")
    seg = mf.new_segment_name()
    ivfpq_encode(corpus, centroids, books, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(f"{index_path}/{seg}")
    from .similarity import _assign_with_dist

    row = (
        _assign_with_dist(corpus, centroids, id_col, vec_col)
        .agg(F.count("*").alias("n"), F.sum("_dist").alias("s"))
        .first()
    )
    # models, codes and drift baseline publish in ONE manifest commit
    # (manifest.py, r11): never observed mismatched; crash-safe rebuild
    mf.commit_replace(
        spark, index_path, [seg],
        legacy=_IVFPQ_LEGACY,
        refs={"centroids": cent_dir, "codebooks": books_dir},
        stats={"n": int(row["n"]), "dist_sum": float(row["s"] or 0.0)},
    )
    mf.vacuum_store(spark, index_path, keep_generations=2)


def append_to_ivfpq_index(
    index_path: str,
    new: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Grow a persisted IVFADC index with ZERO training jobs (r9
    VERDICT #5): encode the new vectors with the STANDING centroids and
    residual codebooks (narrow map — no Lloyd), append the 8-byte code
    rows to the cid-partitioned table, and report coarse-quantizer
    drift exactly as :func:`similarity.append_to_ivf_index` does (mean
    ``1 − cos(x, c(x))`` of the batch vs the index's running mean in
    ``{index_path}/stats``). A drifting ratio means both the coarse
    lists AND the residual codebooks (trained on old residual
    geometry) are stale — retrain via :func:`build_ivfpq_index`.

    Indexes persisted before stats existed have no baseline (the code
    table stores no vectors to backfill from): the first append returns
    ``drift_ratio=None`` and seeds the running stats going forward.

    Durability (r11): the code rows land in a fresh immutable segment
    and the updated stats ride the same one-file manifest commit —
    data and statistics can never disagree, a crash before the commit
    is invisible, and a caller retry cannot double-append."""
    from .similarity import _assign_with_dist, read_ivf_stats

    spark = new.sparkSession
    centroids, books = _read_ivfpq_model(spark, index_path)
    stats = read_ivf_stats(spark, index_path)
    base_n, base_s = stats if stats is not None else (0, 0.0)
    enc = ivfpq_encode(new, centroids, books, id_col, vec_col)
    seg = mf.new_segment_name()
    enc.write.mode("overwrite").partitionBy("cid").parquet(
        f"{index_path}/{seg}"
    )
    row = (
        _assign_with_dist(new, centroids, id_col, vec_col)
        .agg(F.count("*").alias("n"), F.sum("_dist").alias("s"))
        .first()
    )
    n_new, s_new = int(row["n"]), float(row["s"] or 0.0)
    mf.commit_append(
        spark, index_path, [seg],
        legacy=_IVFPQ_LEGACY,
        update_stats=lambda old: {
            "n": (int(old["n"]) if old else base_n) + n_new,
            "dist_sum": (float(old["dist_sum"]) if old else base_s) + s_new,
        },
        retries=5,
    )
    index_mean = base_s / base_n if base_n else None
    batch_mean = s_new / n_new if n_new else None
    return {
        "n_indexed": base_n,
        "index_mean_dist": index_mean,
        "n_appended": n_new,
        "batch_mean_dist": batch_mean,
        "drift_ratio": (
            batch_mean / index_mean
            if index_mean and batch_mean is not None
            else None
        ),
    }


def compact_ivfpq_index(
    spark, index_path: str, n_files: int | None = None,
    keep_generations: int = 2,
) -> dict:
    """Merge the per-append code segments into ONE cid-partitioned
    segment (:func:`similarity.compact_ivf_index` applied to the
    8-byte-code table): models and stats carry over in the manifest,
    old segments retire via vacuum, a crash leaves a committed
    generation readable, and concurrent appends are preserved (r12 —
    ``manifest.commit_compaction`` replaces only the snapshot's
    segments; same models, so mid-compaction codes stay valid).
    Returns ``{files_before, files_after, rows}``."""
    files_before = mf.live_data_file_count(spark, index_path, ("codes",))
    m = mf.latest_manifest(spark, index_path)
    if m is not None:
        replaced = list(m[1].get("segments", []))
        encoded = mf.read_segments(spark, index_path, m[1])
    else:
        replaced = ["codes"]  # pre-manifest layout
        encoded = spark.read.parquet(f"{index_path}/codes")
    if n_files is None:
        n_files = max(1, spark.sparkContext.defaultParallelism // 4)
    rows = encoded.count()
    seg = mf.new_segment_name()
    (
        encoded.repartition(n_files, "cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(f"{index_path}/{seg}")
    )
    mf.commit_compaction(spark, index_path, [seg], replaced,
                         legacy=_IVFPQ_LEGACY)
    mf.vacuum_store(spark, index_path, keep_generations)
    return {
        "files_before": files_before,
        "files_after": mf.live_data_file_count(spark, index_path),
        "rows": rows,
    }


def read_ivfpq_codes(spark, index_path: str, generation: int | None = None):
    """The cid-partitioned 8-byte-code table as of the newest committed
    manifest (union of immutable segment scans); ``generation`` pins a
    retained older manifest (time travel); pre-r11 indexes fall back to
    the bare ``codes`` directory."""
    if generation is not None:
        return mf.read_segments(
            spark, index_path, mf.manifest_at(spark, index_path, generation)
        )
    m = mf.latest_manifest(spark, index_path)
    if m is not None:
        return mf.read_segments(spark, index_path, m[1])
    return spark.read.parquet(f"{index_path}/codes")


def _read_ivfpq_model(
    spark, index_path: str
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """The two bounded model collects (KBs) a persisted IVFADC index
    stores — shared by :func:`query_ivfpq` and
    :func:`append_to_ivfpq_index`. Resolved through the manifest's
    ``refs`` (pre-r11 indexes fall back to the bare directories)."""
    m = mf.latest_manifest(spark, index_path)
    refs = m[1].get("refs", {}) if m is not None else {}
    cent_dir = refs.get("centroids", "centroids")
    books_dir = refs.get("codebooks", "codebooks")
    cents = (
        spark.read.parquet(f"{index_path}/{cent_dir}").orderBy("cid").collect()
    )
    centroids = [[float(x) for x in r["centroid"]] for r in cents]
    book_rows = (
        spark.read.parquet(f"{index_path}/{books_dir}")
        .orderBy("sub_id", "code")
        .collect()
    )
    m = max(r["sub_id"] for r in book_rows) + 1
    n_codes = max(r["code"] for r in book_rows) + 1
    books: list[list[list[float]]] = [
        [None] * n_codes for _ in range(m)  # type: ignore[list-item]
    ]
    for r in book_rows:
        books[r["sub_id"]][r["code"]] = [float(x) for x in r["centroid"]]
    return centroids, books


def query_ivfpq(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_with: DataFrame | None = None,
    shortlist: int = 32,
) -> DataFrame:
    """Top-k against a persisted IVFADC index with ZERO training jobs:
    two bounded model collects (centroids + codebooks, KBs), one
    cid-partitioned scan of the 8-byte-code table, the same broadcast
    ADC probe as :func:`ivfpq_topk` — identical results to the
    train-per-call path by construction."""
    centroids, books = _read_ivfpq_model(spark, index_path)
    encoded = read_ivfpq_codes(spark, index_path)
    return ivfpq_topk(
        encoded, queries, centroids, books, k, nprobe,
        id_col, vec_col, rerank_with, shortlist,
    )
