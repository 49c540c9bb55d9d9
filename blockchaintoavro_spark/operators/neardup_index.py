"""Incremental NEAR-duplicate index — the standing-corpus daily-ingest
shape (r9 VERDICT "What's missing" #1).

``incremental_dedup`` (dedup.py) probes new batches against a standing
EXACT-hash table; production pipelines also need the near-dup analog:
dedup each day's crawl against the full accumulated history without
re-banding the history. This module composes the existing banded-join
machinery into that shape (the reference's remediation loop —
etl.sh:6-33 — re-runs its WHOLE batch per invocation; a standing index
makes each ingest's cost proportional to the ingest):

- :func:`build_neardup_index` persists the band table ONCE —
  MinHash LSH bands for text (``dedup.py:minhash_bands``) or Hamming
  bit-slice bands for perceptual codes (``phash.py:hamming_bands``,
  shared by image pHash / audio AFP / video frame-pHash) — plus a
  one-row meta table pinning the banding parameters, so every later
  probe reconstructs the IDENTICAL banding.
- :func:`probe_neardup_index` bands the new batch with the stored
  parameters, equi-joins it against the standing table (batch side
  broadcast under a size gate — the index, the big side, is NEVER
  shuffled), verifies Hamming candidates with ``bit_count(xor)``, and
  appends the batch's bands (survivors only, by default) so the next
  ingest sees today's corpus.
- :class:`NearDupScrubber` / :func:`neardup_scrub_stream` are the
  ``foreachBatch`` leg: each micro-batch probes, keeps only unseen
  documents, and grows the index — micro-batches execute serially, so
  probe-then-append is well ordered and stream equals batch by
  construction (tested). The applier is EXACTLY-ONCE under crash/replay
  (r12): both of its effects — the survivors written to ``out_path``
  and the bands appended to the index — are manifest commits fenced by
  the micro-batch id (``manifest.last_committed_batch``), and the out
  commit lands FIRST, so whichever single effect a crash strands, the
  replay probes an index that does not yet contain the batch,
  recomputes the identical survivor set, and completes only the
  missing commit. No document is ever dropped and no band or output
  row ever duplicated (every window is kill-tested in
  tests/test_exactly_once.py).

100 TB posture: the standing state is ``n_bands`` 8-byte rows per
document (the band table IS the index — no full text, no signatures);
a probe is one scan of the band table against a broadcast batch (zero
shuffles of history under the gate, a band-keyed equi-join over it) and
candidates are verified row-locally. Nothing is all-pairs; nothing
ranks the history in one task; the only driver materialization is the
one-row meta read.

Durability (r11): the band table is a manifest-pinned segment store
(``manifest.py``) — every append is write-new-segment + one-file
manifest commit, every probe reads exactly one committed generation,
and compaction publishes its rewrite by renaming only the manifest, so
a crash at ANY point leaves the previous generation readable (the r10
delete-then-rename stranding window is gone) and a retried append
cannot duplicate rows. Pre-r11 indexes (a bare ``bands`` directory)
are adopted by the first committing write.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import manifest as mf
from ..session import tiny_df

__all__ = [
    "build_neardup_index",
    "probe_neardup_index",
    "read_neardup_bands",
    "read_scrubbed",
    "NearDupScrubber",
    "neardup_scrub_stream",
    "compact_neardup_index",
    "compact_scrub_output",
]

_KINDS = ("minhash", "hamming")
# pre-manifest on-disk layout, adopted as generation 0 on first commit
_LEGACY = {"segments": ["bands"]}


def _bands_for(df: DataFrame, kind: str, p: dict) -> DataFrame:
    """The band table for ``df`` under the index's stored parameters,
    with the id column normalized to ``_nd_id`` (the standing table's
    layout — probe batches may carry a different id column name)."""
    if kind == "minhash":
        from .dedup import minhash_bands

        b = minhash_bands(
            df,
            id_col=p["id_col"],
            text_col=p["text_col"],
            n_hashes=p["n_hashes"],
            n_bands=p["n_bands"],
            seed=p["seed"],
        )
        return b.select(
            F.col(p["id_col"]).alias("_nd_id"), "band_id",
            F.col("band_hash").alias("band_val"),
        )
    from .phash import hamming_bands

    b = hamming_bands(
        df, id_col=p["id_col"], code_col=p["code_col"],
        n_bands=p["n_bands"],
    )
    return b.select(
        F.col(p["id_col"]).alias("_nd_id"),
        F.col(p["code_col"]).alias("_nd_code"),
        "band_id",
        "band_val",
    )


def build_neardup_index(
    df: DataFrame,
    index_path: str,
    kind: str = "minhash",
    id_col: str = "doc_id",
    text_col: str = "text",
    code_col: str = "phash",
    n_hashes: int = 32,
    n_bands: int | None = None,
    max_hamming: int = 3,
    seed: int = 42,
) -> None:
    """Band the corpus snapshot ONCE and persist the standing index:
    a manifest-pinned band segment (read it via
    :func:`read_neardup_bands`) + ``{index_path}/meta`` (one row: kind
    + banding parameters as JSON, so probes reproduce the identical
    banding). ``kind="minhash"`` expects ``(id, text)``
    and stores LSH bands; ``kind="hamming"`` expects an already-coded
    frame ``(id, code)`` — feed it ``phash_codes`` / ``afp_codes`` /
    ``video_phash_codes`` output, which keeps the index agnostic of the
    modality (image/audio/video all band identically). An EMPTY ``df``
    (e.g. ``corpus.limit(0)``) initializes a fresh index a stream then
    grows from nothing.

    For ``hamming``, exactness at radius ``max_hamming`` needs
    ``max_hamming < n_bands`` (pigeonhole — phash.py module docstring);
    checked here so a bad index is never written."""
    if kind not in _KINDS:
        raise ValueError(f"unknown index kind {kind!r}: one of {_KINDS}")
    if n_bands is None:
        n_bands = 16 if kind == "minhash" else 4
    if kind == "hamming" and max_hamming >= n_bands:
        raise ValueError(
            f"exactness needs max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands})"
        )
    if kind == "minhash" and n_hashes % n_bands != 0:
        raise ValueError(f"n_hashes {n_hashes} not divisible by n_bands {n_bands}")
    params = {
        "id_col": id_col,
        "n_bands": n_bands,
        "seed": seed,
    }
    if kind == "minhash":
        params.update({"text_col": text_col, "n_hashes": n_hashes})
    else:
        params.update({"code_col": code_col, "max_hamming": max_hamming})
    spark = df.sparkSession
    tiny_df(
        spark, [(kind, json.dumps(params, sort_keys=True))],
        "kind string, params string",
    ).write.mode("overwrite").parquet(f"{index_path}/meta")
    seg = mf.new_segment_name()
    _bands_for(df, kind, params).write.mode("overwrite").parquet(
        f"{index_path}/{seg}"
    )
    mf.commit_replace(spark, index_path, [seg], legacy=_LEGACY)
    mf.vacuum_store(spark, index_path, keep_generations=2)


def _read_meta(spark, index_path: str) -> tuple[str, dict]:
    row = spark.read.parquet(f"{index_path}/meta").first()
    return row["kind"], json.loads(row["params"])


def read_neardup_bands(
    spark, index_path: str, generation: int | None = None
) -> DataFrame:
    """The standing band table as of the newest committed manifest —
    a union of immutable segment scans, snapshot-isolated from any
    concurrent append/compaction. ``generation`` pins a retained older
    manifest instead (time travel — "what did the index contain before
    yesterday's ingest?"); raise ``keep_generations`` on the
    maintenance calls to retain more history. Falls back to the
    pre-r11 bare ``bands`` directory for legacy indexes."""
    if generation is not None:
        return mf.read_segments(
            spark, index_path, mf.manifest_at(spark, index_path, generation)
        )
    m = mf.latest_manifest(spark, index_path)
    if m is not None:
        return mf.read_segments(spark, index_path, m[1])
    return spark.read.parquet(f"{index_path}/bands")


def read_scrubbed(
    spark,
    out_path: str,
    generation: int | None = None,
    prune_col: str | None = None,
    prune_lo=None,
    prune_hi=None,
) -> DataFrame:
    """The scrubbed (surviving) documents a :class:`NearDupScrubber`
    has committed to ``out_path`` — a union of immutable per-batch
    segment scans pinned by the newest manifest, snapshot-isolated
    from the in-flight micro-batch; ``generation`` pins a retained
    older manifest (time travel: the corpus as of a past batch). Falls
    back to a bare parquet scan for pre-r12 outputs (written with
    ``mode("append")`` before the store was manifest-committed).

    ``prune_col`` + ``prune_lo``/``prune_hi`` (r13 data skipping):
    segments whose committed ``[min, max]`` range for that column
    cannot intersect the bounds are dropped from the scan entirely —
    the manifest-level file-skip; the caller still applies the row
    filter (pruning is an optimization, never a correctness filter).
    Raises if pruning removes every segment (nothing can match — skip
    the read)."""
    if generation is not None:
        man = mf.manifest_at(spark, out_path, generation)
    else:
        m = mf.latest_manifest(spark, out_path)
        if m is None:
            return spark.read.parquet(out_path)
        man = m[1]
    if prune_col is not None:
        man = mf.prune_manifest(man, prune_col, prune_lo, prune_hi)
    return mf.read_segments(spark, out_path, man)


def _append_bands(
    spark, index_path: str, bands: DataFrame, batch_id: int | None = None,
    query_id: str | None = None,
) -> None:
    """Durable append: write a fresh immutable segment, then publish it
    with one manifest commit — a crash before the commit leaves an
    orphan directory no probe can see, so retries never duplicate.
    ``batch_id`` (streaming appliers) stamps the exactly-once fence
    into the same commit, keyed by ``query_id`` when the applier knows
    its streaming lineage (r13, ADVICE r12 #1)."""
    seg = mf.new_segment_name()
    bands.write.mode("overwrite").parquet(f"{index_path}/{seg}")
    update = (
        mf.fence_stats(batch_id, query_id=query_id)
        if batch_id is not None else None
    )
    mf.commit_append(
        spark, index_path, [seg], legacy=_LEGACY, retries=5,
        update_stats=update,
    )


def _match_plan(
    index_bands: DataFrame, probe_side: DataFrame, kind: str, p: dict
) -> DataFrame:
    """The LAZY match plan (the probe's physical shape, plan-asserted
    in tests/test_plans.py before :func:`probe_neardup_index`
    materializes it): band-keyed equi-join, Hamming verify row-local."""
    if kind == "minhash":
        return (
            index_bands.withColumnRenamed("_nd_id", "d_old")
            .join(
                probe_side.withColumnRenamed("_nd_id", "d_new"),
                ["band_id", "band_val"],
            )
            .select("d_new", "d_old")
            .distinct()
        )
    return (
        index_bands.select(
            F.col("_nd_id").alias("d_old"),
            F.col("_nd_code").alias("_c_old"),
            "band_id",
            "band_val",
        )
        .join(
            probe_side.select(
                F.col("_nd_id").alias("d_new"),
                F.col("_nd_code").alias("_c_new"),
                "band_id",
                "band_val",
            ),
            ["band_id", "band_val"],
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("_c_new").bitwiseXOR(F.col("_c_old"))),
        )
        .filter(F.col("hamming") <= p["max_hamming"])
        .groupBy("d_new", "d_old")
        .agg(F.min("hamming").alias("hamming"))
    )


def probe_neardup_index(
    batch: DataFrame,
    index_path: str,
    append: str = "survivors",
    broadcast_max_bands: int = 4_000_000,
) -> DataFrame:
    """Near-dup matches of ``batch`` against the standing index:
    ``(d_new, d_old)`` for minhash (LSH candidates — same contract as
    ``minhash_candidate_pairs``), ``(d_new, d_old, hamming)`` for
    hamming (verified, ``hamming`` = the minimum over matched code
    pairs, so multi-code ids — video frames — report their best
    alignment). ``d_new`` is a batch id, ``d_old`` an indexed id; a
    re-ingested identical id matches itself, which IS a duplicate.

    Physical plan: the batch's bands broadcast under the gate
    (``batch_rows × n_bands ≤ broadcast_max_bands``), so the probe is
    ONE streaming scan of the standing band table — history is never
    shuffled; over the gate it degrades to a band-keyed equi-join that
    co-partitions at any size. Either way: equi-join, never a nested
    loop (plan-asserted in tests/test_plans.py).

    The matches materialize EAGERLY (localCheckpoint) before any
    append, because the append mutates the file set the probe reads —
    the same materialize-observe trade as ``_dup_dictionary``. The
    checkpoint handle rides the result as ``_spark_graft_checkpoint``
    for callers that want to release it after consuming the matches.

    ``append``: ``"survivors"`` (default) adds bands of batch docs with
    NO match — the dedup-pipeline semantics where dropped duplicates
    must not pollute the index; ``"all"`` adds every batch doc (audit
    indexes that track duplicates too); ``"none"`` leaves the index
    read-only (dry-run probes)."""
    if append not in ("survivors", "all", "none"):
        raise ValueError(f"unknown append mode {append!r}")
    matches, bb, kind, p = _probe_core(batch, index_path, broadcast_max_bands)
    if append != "none":
        to_add = bb
        if append == "survivors":
            to_add = bb.join(
                matches.select(F.col("d_new").alias("_nd_id")).distinct(),
                "_nd_id",
                "left_anti",
            )
        _append_bands(batch.sparkSession, index_path, to_add)
    bb.unpersist()
    matches._spark_graft_checkpoint = matches  # releasable by the caller
    return matches


def _probe_core(
    batch: DataFrame, index_path: str, broadcast_max_bands: int
) -> tuple[DataFrame, DataFrame, str, dict]:
    """Band-once probe shared by :func:`probe_neardup_index` and
    :class:`NearDupScrubber`: returns ``(matches, bb, kind, params)``
    where ``matches`` is checkpointed (safe across store mutation) and
    ``bb`` is the PERSISTED band frame of the batch — the caller reuses
    it for the append (one tokenize/hash pass per batch — r10 VERDICT
    #5) and must ``unpersist()`` it."""
    spark = batch.sparkSession
    kind, p = _read_meta(spark, index_path)
    index_bands = read_neardup_bands(spark, index_path)

    bb = _bands_for(batch, kind, p)
    from pyspark import StorageLevel

    # the batch bands feed the probe AND the append — persist so the
    # batch is banded (tokenized / hashed) once, released by the caller
    bb = bb.persist(StorageLevel.MEMORY_AND_DISK)
    n_bands_rows = bb.count()
    probe_side = (
        F.broadcast(bb) if n_bands_rows <= broadcast_max_bands else bb
    )

    matches = _match_plan(index_bands, probe_side, kind, p)
    # materialize BEFORE mutating the band store (and before bb drops)
    matches = matches.localCheckpoint()
    return matches, bb, kind, p


def _batch_pairs(df: DataFrame, kind: str, p: dict) -> DataFrame:
    """WITHIN-batch candidate pairs under the index's own banding
    parameters — the same construction the probe uses, applied
    batch-vs-batch."""
    if kind == "minhash":
        from .dedup import minhash_candidate_pairs

        return minhash_candidate_pairs(
            df, p["id_col"], p["text_col"],
            p["n_hashes"], p["n_bands"], p["seed"],
        )
    from .phash import phash_neardup_pairs

    return phash_neardup_pairs(
        df, p["max_hamming"], p["id_col"], p["code_col"], p["n_bands"]
    ).select("d1", "d2")


class NearDupScrubber:
    """``foreachBatch`` applier: probe each micro-batch against the
    standing index, append ONLY unseen documents (with their original
    columns) to ``out_path``, and grow the index with exactly those
    survivors — so a document near-duplicating anything in history OR
    in an earlier micro-batch is dropped, and later batches dedup
    against everything kept so far. Micro-batches execute serially, so
    probe-then-append is well ordered and the stream equals the batch
    sequence by construction (tests/test_streaming.py).

    EXACTLY-ONCE (r12): ``out_path`` is a manifest-committed store
    (read it with :func:`read_scrubbed`), and both per-batch effects
    are fenced by the micro-batch id — see ``__call__``. A crash at
    ANY point (including between the two commits) neither drops a
    document from the output corpus nor duplicates output rows or
    index bands on the checkpoint's redelivery
    (tests/test_exactly_once.py drives every window).

    ``dedup_within_batch=True`` additionally resolves near-dups INSIDE
    each batch (banded pairs under the index's own parameters →
    connected components → keep the min-id per cluster) before anything
    is kept or indexed — the full production semantics when a single
    day's crawl can contain its own duplicates. Default False: within-
    batch duplicates both survive (the batch operators remain available
    for callers who dedup upstream).

    PER-LINEAGE fences (r13, ADVICE r12 #1): inside a streaming slot
    the fence is keyed by the query's persistent id
    (``manifest.streaming_query_id``), so a stream restarted on a NEW
    checkpoint (batch ids restart at 0) or a second query feeding the
    same store re-applies its own batches instead of being silently
    swallowed by another lineage's high-water mark. ``fence_key``
    supplies the lineage key for direct (non-stream) callers; the
    stream wrapper passes its checkpoint dir."""

    def __init__(
        self,
        index_path: str,
        out_path: str,
        broadcast_max_bands: int = 4_000_000,
        dedup_within_batch: bool = False,
        compact_every: int | None = None,
        fence_key: str | None = None,
    ) -> None:
        self.index_path = index_path
        self.out_path = out_path
        self.broadcast_max_bands = broadcast_max_bands
        self.dedup_within_batch = dedup_within_batch
        self.compact_every = compact_every
        self.fence_key = fence_key
        self.batches = 0  # introspection for tests
        self.compactions = 0
        self.last_query_id: str | None = None  # introspection for tests

    def _scrub_core(self, batch: DataFrame):
        """Probe + survivor resolution with NO store writes: returns
        ``(survivors, surv_bands, bb)`` where ``survivors`` is
        localCheckpoint-materialized (stable across later store
        mutation), ``surv_bands`` is the survivors' slice of the
        probe's persisted band frame (the batch is banded ONCE — r10
        VERDICT #5), and ``bb`` must be ``unpersist()``-ed by the
        caller after both are consumed. Deterministic given the index
        generation and the batch (seeded hashing, min-id cluster
        resolution) — the property the replay path relies on."""
        from blockchaintoavro_spark.session import release_local_checkpoint

        # probe read-only: the index must grow with the FINAL survivor
        # set (after the optional within-batch resolution), not with
        # every history-unmatched row
        matches, bb, kind, p = _probe_core(
            batch, self.index_path, self.broadcast_max_bands
        )
        id_col = p["id_col"]
        survivors = batch.join(
            matches.select(F.col("d_new").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        if self.dedup_within_batch:
            from .dedup import dedup_clusters

            labels = dedup_clusters(
                _batch_pairs(survivors, kind, p), id_out="_ndc_id"
            )
            losers = labels.filter(
                F.col("_ndc_id") != F.col("cluster_id")
            ).select(F.col("_ndc_id").alias(id_col))
            survivors = survivors.join(losers, id_col, "left_anti")
        survivors = survivors.localCheckpoint()
        release_local_checkpoint(matches)
        surv_bands = bb.join(
            survivors.select(F.col(id_col).alias("_nd_id")),
            "_nd_id",
            "left_semi",
        )
        return survivors, surv_bands, bb, id_col

    def scrub(self, batch: DataFrame) -> DataFrame:
        """Probe + survivors of one batch (exposed for direct
        single-writer batch use); appends the survivors' bands to the
        index as a side effect. NOT fenced — redelivery semantics
        belong to the streaming path (``__call__``), which fences both
        of its effects by batch id."""
        survivors, surv_bands, bb, _ = self._scrub_core(batch)
        _append_bands(batch.sparkSession, self.index_path, surv_bands)
        bb.unpersist()
        return survivors

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        """Exactly-once ``foreachBatch`` slot (r12 — closes the r11
        replay data-loss window): both effects are manifest commits
        fenced by ``batch_id``, ordered out-path FIRST.

        Why the order matters: a replayed batch must probe an index
        that does NOT yet contain its own bands — with index-first, a
        crash between the commits made the replay match every survivor
        against itself and emit zero survivors (silent loss). With
        out-first, the crash windows are: before the out commit
        (nothing visible — plain re-run), between the two (out fenced
        and skipped, probe unchanged ⇒ identical survivors recomputed,
        index append completes), after both (both fenced — no-op)."""
        from blockchaintoavro_spark.session import release_local_checkpoint

        spark = batch.sparkSession
        qid = mf.streaming_query_id(spark) or self.fence_key
        self.last_query_id = qid
        out_last = mf.last_committed_batch(spark, self.out_path, qid)
        idx_last = mf.last_committed_batch(spark, self.index_path, qid)
        out_done = out_last is not None and batch_id <= out_last
        idx_done = idx_last is not None and batch_id <= idx_last
        if not (out_done and idx_done):
            survivors, surv_bands, bb, id_col = self._scrub_core(batch)
            if not out_done:
                seg = mf.new_segment_name()
                # per-segment id range rides the WRITE job itself (r14
                # one-scan append) and the same commit as the data: a
                # range probe over the scrubbed corpus scans only the
                # micro-batch segments that can match
                observed, resolve = mf.observe_segment_stats(
                    survivors, [id_col]
                )
                observed.write.mode("overwrite").parquet(
                    f"{self.out_path}/{seg}"
                )
                mf.commit_append(
                    spark, self.out_path, [seg],
                    update_stats=mf.fence_stats(
                        batch_id, query_id=qid,
                        extra=mf.segment_stats_update({seg: resolve()}),
                    ),
                    retries=5,
                )
            if not idx_done:
                _append_bands(
                    spark, self.index_path, surv_bands, batch_id=batch_id,
                    query_id=qid,
                )
            release_local_checkpoint(survivors)
            bb.unpersist()
        self.batches += 1
        # each micro-batch appends one segment to each store; fold the
        # small files back periodically in the writer's own serialized
        # slot (stats — including the fence — carry over the rewrite)
        if self.compact_every and self.batches % self.compact_every == 0:
            compact_neardup_index(spark, self.index_path)
            compact_scrub_output(spark, self.out_path)
            self.compactions += 1


def neardup_scrub_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    broadcast_max_bands: int = 4_000_000,
    dedup_within_batch: bool = False,
    compact_every: int | None = None,
):
    """Streaming leg: returns a ``DataStreamWriter`` (caller picks the
    trigger and starts it) whose ``foreachBatch`` near-dup-scrubs each
    micro-batch against the standing index at ``index_path`` via
    :class:`NearDupScrubber`, committing surviving documents to the
    ``out_path`` manifest store (read with :func:`read_scrubbed`) and
    growing the index with their bands — both effects batch-id-fenced
    per query lineage (runtime query id, falling back to the checkpoint
    dir), so the checkpoint's redelivery after a crash is exactly-once
    and a NEW checkpoint's restarted batch ids are not swallowed."""
    applier = NearDupScrubber(
        index_path, out_path, broadcast_max_bands, dedup_within_batch,
        compact_every, fence_key=checkpoint_dir,
    )
    writer = (
        stream.writeStream.foreachBatch(applier)
        .option("checkpointLocation", checkpoint_dir)
    )
    writer._spark_graft_applier = applier  # introspection for tests
    return writer


def _live_data_files(spark, index_path: str) -> int:
    """Data-file count across the segments the newest manifest pins
    (or the legacy ``bands`` dir) — the metric compaction exists to
    bound."""
    return mf.live_data_file_count(spark, index_path, ("bands",))


def compact_neardup_index(
    spark, index_path: str, n_files: int | None = None,
    keep_generations: int = 2,
) -> dict:
    """Rewrite the band store into ONE segment of ``n_files`` files
    clustered by ``band_val`` — the maintenance step a daily-append
    index needs: every probe lists and opens the live file set, and one
    small segment PER INGEST (the append protocol's natural output)
    eventually makes file-system metadata, footer reads and task
    scheduling the probe's real cost, exactly the small-files problem
    lakehouse OPTIMIZE jobs exist for. Clustering on ``band_val`` also
    tightens band min/max ranges per file.

    The swap IS the manifest commit (``manifest.py``): the merged
    segment is written first, one manifest rename publishes it, and
    only :func:`manifest.vacuum_store` (run here with
    ``keep_generations``) retires the old segments — so a crash at any
    point, including mid-compact, leaves a committed generation
    readable (closes the r10 delete-then-rename stranding window).
    Concurrent PROBES of the retained generations are safe, and as of
    r12 so are concurrent APPENDS: the rewrite replaces exactly the
    segments of the snapshot it read (``manifest.commit_compaction``,
    the OPTIMIZE conflict rule), so a segment appended mid-compaction
    is carried forward instead of one side failing. Returns
    ``{files_before, files_after, rows}``."""
    files_before = _live_data_files(spark, index_path)
    m = mf.latest_manifest(spark, index_path)
    if m is not None:
        replaced = list(m[1].get("segments", []))
        bands = mf.read_segments(spark, index_path, m[1])
    else:
        replaced = ["bands"]  # pre-manifest layout, adopted below
        bands = spark.read.parquet(f"{index_path}/bands")
    if n_files is None:
        n_files = max(1, spark.sparkContext.defaultParallelism // 4)
    rows = bands.count()
    seg = mf.new_segment_name()
    bands.repartition(n_files, "band_val").write.mode("overwrite").parquet(
        f"{index_path}/{seg}"
    )
    mf.commit_compaction(spark, index_path, [seg], replaced, legacy=_LEGACY)
    mf.vacuum_store(spark, index_path, keep_generations)
    return {
        "files_before": files_before,
        "files_after": _live_data_files(spark, index_path),
        "rows": rows,
    }


def compact_scrub_output(
    spark, out_path: str, n_files: int | None = None,
    keep_generations: int = 2,
) -> dict:
    """OPTIMIZE for the scrubber's output store: the streaming applier
    commits one survivors segment per micro-batch, so a long-running
    stream accumulates small files exactly like the band index does —
    fold them into one segment published by a manifest commit. The
    manifest copy carries ``stats`` (including the exactly-once
    ``last_batch_id`` fence) forward unchanged, so a replay remains a
    no-op across compactions; a batch committed mid-compaction is
    carried forward (``manifest.commit_compaction``). Returns
    ``{files_before, files_after, rows}``."""
    files_before = mf.live_data_file_count(spark, out_path)
    m = mf.latest_manifest(spark, out_path)
    if m is None:
        raise ValueError(f"{out_path}: not a scrubber output store")
    replaced = list(m[1].get("segments", []))
    docs = mf.read_segments(spark, out_path, m[1])
    if n_files is None:
        n_files = max(1, spark.sparkContext.defaultParallelism // 4)
    rows = docs.count()
    seg = mf.new_segment_name()
    docs.repartition(n_files).write.mode("overwrite").parquet(
        f"{out_path}/{seg}"
    )
    mf.commit_compaction(spark, out_path, [seg], replaced)
    mf.vacuum_store(spark, out_path, keep_generations)
    return {
        "files_before": files_before,
        "files_after": mf.live_data_file_count(spark, out_path),
        "rows": rows,
    }
