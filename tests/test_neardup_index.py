"""Incremental near-dup index (operators/neardup_index.py): two-batch
recall vs exact Jaccard, Hamming exactness vs brute force, append-mode
semantics, empty-index bootstrap, and the probe's physical plan (banded
equi-join on a never-shuffled history — no nested loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blockchaintoavro_spark.operators.neardup_index import (
    build_neardup_index,
    probe_neardup_index,
    read_neardup_bands,
)


def _docs(spark, sf_dir, n=200):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < n
    )


def test_incremental_minhash_two_batch_recall(spark, sf_dir, tmpdir):
    """The daily-ingest shape: history indexed once, a new batch probed
    against it. Cross-batch LSH matches must cover >= 90% of true
    cross-batch Jaccard>=0.4 pairs — the same recall contract the batch
    operator (minhash_candidate_pairs) is held to vs dq33."""
    from blockchaintoavro_spark.operators.dedup import exact_jaccard_pairs

    d = _docs(spark, sf_dir)
    history = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    idx = f"{tmpdir}/nd_minhash"
    build_neardup_index(history, idx, kind="minhash")
    got = {
        (r["d_new"], r["d_old"])
        for r in probe_neardup_index(batch, idx, append="none").collect()
    }
    truth = {
        (r["d1"], r["d2"])
        for r in exact_jaccard_pairs(d, threshold=0.4).collect()
        if (r["d1"] % 2) != (r["d2"] % 2)
    }
    # orient truth as (new=odd, old=even)
    truth = {(a, b) if a % 2 == 1 else (b, a) for a, b in truth}
    assert truth, "fixture should contain cross-batch near-dup pairs"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"incremental recall {recall:.3f} < 0.9"
    # and the probe agrees with the batch operator's candidate set,
    # restricted to cross-batch pairs (same banding, same seed)
    from blockchaintoavro_spark.operators.dedup import minhash_candidate_pairs

    cand = {
        (r["d1"], r["d2"])
        for r in minhash_candidate_pairs(d).collect()
        if (r["d1"] % 2) != (r["d2"] % 2)
    }
    cand = {(a, b) if a % 2 == 1 else (b, a) for a, b in cand}
    assert got == cand


def test_incremental_hamming_exact_vs_brute_force(spark, tmpdir):
    """Hamming kind at radius < n_bands is EXACT by pigeonhole: probing
    a batch of pHash codes against the indexed history must return
    precisely the brute-force cross pairs with hamming <= 3, with the
    verified distance."""
    from blockchaintoavro_spark.operators.phash import phash_fixture_codes

    base = spark.range(60).select(F.col("id").alias("doc_id"))
    codes = phash_fixture_codes(base).collect()
    by_id = {r["doc_id"]: r["phash"] for r in codes}
    hist_ids = {i for i in by_id if i % 5 < 3}
    batch_ids = set(by_id) - hist_ids
    truth = {}
    for b in batch_ids:
        for h in hist_ids:
            d = bin(by_id[b] ^ by_id[h]).count("1")
            if d <= 3:
                truth[(b, h)] = d
    assert truth, "fixture should contain cross-batch perceptual dups"

    codes_df = spark.createDataFrame(codes)
    idx = f"{tmpdir}/nd_phash"
    build_neardup_index(
        codes_df.filter(F.col("doc_id") % 5 < 3), idx,
        kind="hamming", code_col="phash", n_bands=4, max_hamming=3,
    )
    got = {
        (r["d_new"], r["d_old"]): r["hamming"]
        for r in probe_neardup_index(
            codes_df.filter(F.col("doc_id") % 5 >= 3), idx, append="none"
        ).collect()
    }
    assert got == truth


def test_incremental_append_modes(spark, tmpdir):
    """append='survivors' must grow the index with unmatched docs ONLY
    (dropped duplicates never pollute the index); 'none' leaves it
    untouched; 'all' adds everything. Growth is observable both in the
    band table's id set and in a later probe matching the newly indexed
    content."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    base = mk([(1, a)])
    idx = f"{tmpdir}/nd_inc"
    build_neardup_index(base, idx, kind="minhash")

    ids_in_index = lambda: {
        r["_nd_id"]
        for r in read_neardup_bands(spark, idx).select("_nd_id").distinct().collect()
    }
    assert ids_in_index() == {1}

    # batch: doc 2 duplicates doc 1; doc 3 is new
    batch = mk([(2, a), (3, c)])
    m = probe_neardup_index(batch, idx, append="survivors")
    assert {(r["d_new"], r["d_old"]) for r in m.collect()} == {(2, 1)}
    assert ids_in_index() == {1, 3}  # the duplicate was NOT appended

    # the survivor is now probe-able: a dup of doc 3 matches it
    m2 = probe_neardup_index(mk([(4, c)]), idx, append="none")
    assert {(r["d_new"], r["d_old"]) for r in m2.collect()} == {(4, 3)}
    assert ids_in_index() == {1, 3}  # append='none' left it untouched

    # append='all' indexes even matched docs
    probe_neardup_index(mk([(5, a)]), idx, append="all").collect()
    assert ids_in_index() == {1, 3, 5}

    with pytest.raises(ValueError, match="append"):
        probe_neardup_index(batch, idx, append="sometimes")


def test_index_bootstrap_from_empty_and_param_validation(spark, tmpdir):
    """An index built from a zero-row frame is a valid empty store a
    first batch probes cleanly (no matches) and then populates; bad
    banding parameters are rejected before anything is written."""
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = f"{tmpdir}/nd_empty"
    build_neardup_index(mk([]).limit(0), idx, kind="minhash")
    b1 = mk([(1, "alpha beta gamma delta epsilon zeta eta theta")])
    assert probe_neardup_index(b1, idx).count() == 0
    m = probe_neardup_index(
        mk([(2, "alpha beta gamma delta epsilon zeta eta theta")]), idx
    )
    assert {(r["d_new"], r["d_old"]) for r in m.collect()} == {(2, 1)}

    with pytest.raises(ValueError, match="max_hamming"):
        build_neardup_index(
            mk([]), f"{tmpdir}/bad1", kind="hamming", n_bands=3, max_hamming=3
        )
    with pytest.raises(ValueError, match="divisible"):
        build_neardup_index(
            mk([]), f"{tmpdir}/bad2", kind="minhash", n_hashes=32, n_bands=5
        )
    with pytest.raises(ValueError, match="kind"):
        build_neardup_index(mk([]), f"{tmpdir}/bad3", kind="semantic")


def test_probe_plan_is_banded_equijoin_history_not_shuffled(spark, sf_dir):
    """The probe's physical plan at 100 TB: the batch side broadcasts
    (under the gate), so the standing band table is scanned ONCE and
    never shuffled; no nested loop, no cartesian product. Over the
    gate it must degrade to a shuffled band-keyed equi-join — still no
    nested loop."""
    import json

    from blockchaintoavro_spark.operators.neardup_index import (
        _bands_for,
        _match_plan,
    )

    d = _docs(spark, sf_dir, 100)
    p = {
        "id_col": "doc_id", "text_col": "text",
        "n_hashes": 32, "n_bands": 16, "seed": 42,
    }
    hist = _bands_for(d.filter(F.col("doc_id") % 2 == 0), "minhash", p)
    bb = _bands_for(d.filter(F.col("doc_id") % 2 == 1), "minhash", p)
    jvm = spark.sparkContext._jvm
    plan = lambda df: jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    s = plan(_match_plan(hist, F.broadcast(bb), "minhash", p))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s and "NestedLoop" not in s
    # history side carries no Exchange feeding the join build
    s2 = plan(_match_plan(hist, bb, "minhash", p))
    assert "CartesianProduct" not in s2 and "NestedLoop" not in s2

    ph = {"id_col": "doc_id", "code_col": "phash", "n_bands": 4, "max_hamming": 3}
    codes = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7919).alias("phash")
    )
    hb = _bands_for(codes, "hamming", ph)
    s3 = plan(_match_plan(hb, F.broadcast(hb), "hamming", ph))
    assert "BroadcastHashJoin" in s3
    assert "CartesianProduct" not in s3 and "NestedLoop" not in s3
    assert json.dumps(ph)  # params stay JSON-serializable (meta contract)


def test_embedding_simhash_rides_hamming_index(spark, sf_dir, tmpdir):
    """Embedding near-dup through the SAME standing hamming index the
    perceptual codes use: sign-projection codes are scale-invariant
    (positive rescale flips no plane sign → Hamming 0), so rescaled
    re-ingests match their source exactly, while unrelated embeddings
    sit ~n_bits/2 bits away and never probe out."""
    from blockchaintoavro_spark.operators.similarity import (
        embedding_simhash64,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 60
    )
    codes = embedding_simhash64(emb)
    idx = f"{tmpdir}/nd_emb"
    build_neardup_index(
        codes, idx, kind="hamming", id_col="vec_id", code_col="code",
        n_bands=4, max_hamming=3,
    )
    # batch: positive-rescaled copies of vectors 0..9 (+offset ids) and
    # ten fresh unrelated vectors (60..69)
    rescaled = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 10
    ).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * 2.5
        ).alias("embedding"),
    )
    fresh = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        (F.col("vec_id") >= 60) & (F.col("vec_id") < 70)
    ).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    batch_codes = embedding_simhash64(rescaled.unionByName(fresh))
    got = probe_neardup_index(batch_codes, idx, append="none").collect()
    matches = {(r["d_new"], r["d_old"]): r["hamming"] for r in got}
    # every rescaled copy matches exactly its source at Hamming 0 …
    assert {(1000 + i, i): 0 for i in range(10)}.items() <= matches.items()
    # … and nothing else sneaks in (unrelated ≈ 31 bits away)
    assert all(dn >= 1000 and dn - 1000 == do for (dn, do) in matches)


def test_scrubber_dedup_within_batch_and_compaction(spark, tmpdir):
    """dedup_within_batch=True resolves near-dups INSIDE a batch
    (connected components, keep-min) before keeping or indexing
    anything; compact_neardup_index rewrites the appended small files
    into a few band-clustered ones with probe results unchanged."""
    from blockchaintoavro_spark.operators.neardup_index import (
        NearDupScrubber,
        compact_neardup_index,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    idx = f"{tmpdir}/nd_wb"
    build_neardup_index(mk([]).limit(0), idx, kind="minhash")
    scrubber = NearDupScrubber(idx, f"{tmpdir}/nd_wb_out",
                               dedup_within_batch=True)
    # one batch with an internal duplicate pair (5, 9) and a unique doc
    kept = sorted(
        r["doc_id"] for r in scrubber.scrub(mk([(9, a), (5, a), (3, c)])).collect()
    )
    assert kept == [3, 5]  # min-id of the {5,9} cluster wins
    ids = {
        r["_nd_id"]
        for r in read_neardup_bands(spark, idx).select("_nd_id").distinct().collect()
    }
    assert ids == {3, 5}  # the within-batch loser never entered the index
    # and history still wins over later batches
    kept2 = sorted(r["doc_id"] for r in scrubber.scrub(mk([(7, c)])).collect())
    assert kept2 == []

    # compaction: several appends have sprayed small files; rewrite to
    # 2 and probe results stay identical
    before_probe = sorted(
        map(tuple, probe_neardup_index(mk([(100, a), (101, c)]), idx,
                                       append="none").collect())
    )
    stats = compact_neardup_index(spark, idx, n_files=2)
    assert stats["files_after"] <= 2 < stats["files_before"]
    after_probe = sorted(
        map(tuple, probe_neardup_index(mk([(100, a), (101, c)]), idx,
                                       append="none").collect())
    )
    assert after_probe == before_probe and len(after_probe) == 2


def test_scrubber_bands_each_batch_once(spark, tmpdir, monkeypatch):
    """r10 VERDICT #5: the scrubber must reuse the probe's persisted
    band frame for the index append instead of re-tokenizing the
    survivors — i.e. exactly ONE _bands_for call per scrubbed batch."""
    from blockchaintoavro_spark.operators import neardup_index as ndi

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    idx = f"{tmpdir}/nd_onceband"
    ndi.build_neardup_index(mk([(1, a)]), idx, kind="minhash")

    calls = []
    real = ndi._bands_for
    monkeypatch.setattr(
        ndi, "_bands_for", lambda *args: calls.append(1) or real(*args)
    )
    scrubber = ndi.NearDupScrubber(idx, f"{tmpdir}/nd_onceband_out")
    kept = sorted(
        r["doc_id"] for r in scrubber.scrub(mk([(2, a), (3, c)])).collect()
    )
    assert kept == [3]
    assert len(calls) == 1  # banded once: probe frame reused for append
    ids = {
        r["_nd_id"]
        for r in ndi.read_neardup_bands(spark, idx)
        .select("_nd_id").distinct().collect()
    }
    assert ids == {1, 3}


def test_scrubber_auto_compaction_bounds_segments(spark, tmpdir):
    """compact_every: the foreachBatch applier folds the per-batch band
    segments back into one inside its own serialized slot — segment
    count stays bounded, dedup behavior identical."""
    from blockchaintoavro_spark.operators import manifest as mfmod
    from blockchaintoavro_spark.operators.neardup_index import (
        NearDupScrubber,
        build_neardup_index,
        read_neardup_bands,
        read_scrubbed,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    d = "watermarks bound the state kept for late arriving event time rows"
    idx = f"{tmpdir}/nd_autocompact"
    build_neardup_index(mk([]).limit(0), idx, kind="minhash")
    scrubber = NearDupScrubber(
        idx, f"{tmpdir}/nd_ac_out", compact_every=2
    )
    scrubber(mk([(1, a), (2, c)]), 0)
    scrubber(mk([(3, a), (4, d)]), 1)  # 3 dups 1 -> dropped
    assert scrubber.batches == 2 and scrubber.compactions == 1
    gen, man = mfmod.latest_manifest(spark, idx)
    assert len(man["segments"]) == 1  # folded back to one segment
    ids = {
        r["_nd_id"]
        for r in read_neardup_bands(spark, idx)
        .select("_nd_id").distinct().collect()
    }
    assert ids == {1, 2, 4}
    # the index keeps working after compaction
    scrubber(mk([(5, d), (6, c)]), 2)
    # out_path is a manifest store as of r12; compact_every folds it too
    gen_o, man_o = mfmod.latest_manifest(spark, f"{tmpdir}/nd_ac_out")
    assert len(man_o["segments"]) == 2  # compacted at batch 2 + batch 3's
    got = sorted(
        r["doc_id"]
        for r in read_scrubbed(spark, f"{tmpdir}/nd_ac_out").collect()
    )
    assert got == [1, 2, 4]  # 5 dups 4, 6 dups 2
