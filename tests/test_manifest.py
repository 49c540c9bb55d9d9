"""Manifest commit protocol (operators/manifest.py): crash-safety and
snapshot isolation of the standing stores (r10 VERDICT #1, ADVICE r10
items 1-3). The r10 compactors swapped via delete-then-rename — a crash
between the two strands the store; these tests pin that the manifest
protocol closes every such window:

- a crash ANYWHERE mid-compact leaves the previous generation readable
  (kill injected between segment write and manifest commit, and between
  commit and vacuum);
- a crashed append is invisible (orphan segment, no manifest) and a
  full retry does NOT duplicate rows;
- losing a generation race raises instead of silently clobbering;
- vacuum retires exactly the expired generations' private dirs;
- a pre-manifest (legacy-layout) store is adopted by its first commit
  without rewriting data.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from blockchaintoavro_spark.operators import manifest as mf


def _store(spark, root, rows):
    spark.createDataFrame(rows, "k long, v string").write.mode(
        "overwrite"
    ).parquet(root)


def _read_ids(spark, root):
    m = mf.latest_manifest(spark, root)
    df = mf.read_segments(spark, root, m[1])
    return sorted(r["k"] for r in df.collect())


def _append(spark, root, rows, legacy=None):
    seg = mf.new_segment_name()
    spark.createDataFrame(rows, "k long, v string").write.parquet(
        f"{root}/{seg}"
    )
    mf.commit_append(spark, root, [seg], legacy=legacy)
    return seg


def test_append_commit_and_snapshot_read(spark, tmp_path):
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    _append(spark, root, [(2, "b"), (3, "c")])
    assert _read_ids(spark, root) == [1, 2, 3]
    gen, man = mf.latest_manifest(spark, root)
    assert gen == 2 and len(man["segments"]) == 2


def test_crashed_append_is_invisible_and_retry_safe(spark, tmp_path):
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    # crash AFTER data write, BEFORE commit: orphan segment on disk
    orphan = mf.new_segment_name()
    spark.createDataFrame([(9, "x")], "k long, v string").write.parquet(
        f"{root}/{orphan}"
    )
    assert _read_ids(spark, root) == [1]  # invisible to readers
    # the caller's full retry (new segment + commit) does not duplicate
    _append(spark, root, [(9, "x")])
    assert _read_ids(spark, root) == [1, 9]
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(f"{root}/{orphan}")
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    # a vacuum with the default grace window PROTECTS the fresh orphan
    # (it could be a concurrent appender's staged segment — ADVICE r11)
    mf.vacuum_store(spark, root, keep_generations=10)
    assert fs.exists(jp)
    # past the grace window (forced to 0 here) the orphan is retired
    mf.vacuum_store(spark, root, keep_generations=10, orphan_grace_seconds=0)
    assert not fs.exists(jp)
    assert _read_ids(spark, root) == [1, 9]


def test_concurrent_commit_detected(spark, tmp_path):
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    gen, man = mf.latest_manifest(spark, root)
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_manifest(spark, root, man, gen)  # generation taken


def test_commit_point_atomic_exactly_one_winner_per_generation(
    spark, tmp_path
):
    """r12 (ADVICE r11 #3): the commit point is an atomic
    create-if-absent — N threads racing the SAME generation produce
    exactly ONE committed manifest; every loser raises; the winner's
    payload is intact (never silently overwritten, the POSIX-rename
    failure mode this replaced)."""
    import threading

    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])  # gen 1
    results: dict[int, str] = {}
    lock = threading.Lock()

    def worker(i):
        try:
            mf.commit_manifest(
                spark, root, {"segments": [], "stats": {"writer": i}}, 2
            )
            out = "won"
        except mf.ConcurrentCommitError:
            out = "lost"
        with lock:
            results[i] = out

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results.values()).count("won") == 1
    gen, man = mf.latest_manifest(spark, root)
    winner = next(i for i, r in results.items() if r == "won")
    assert gen == 2 and man["stats"] == {"writer": winner}
    # and no stale .tmp files leak from the losers (their cleanup ran)
    jdir = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/{mf.MANIFEST_DIR}")
    fs = jdir.getFileSystem(spark._jsc.hadoopConfiguration())
    tmps = [
        s.getPath().getName()
        for s in fs.listStatus(jdir)
        if s.getPath().getName().startswith(".tmp-")
    ]
    assert tmps == []


def test_vacuum_grace_protects_inflight_append_staging(spark, tmp_path):
    """ADVICE r11 #2: vacuum must not delete a CONCURRENT appender's
    staged-but-uncommitted segment (or .tmp manifest) — under the
    default grace window fresh orphans survive, so the in-flight append
    can still commit and its manifest references a live directory."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    # an in-flight append: segment staged, commit not yet issued
    staged = mf.new_segment_name()
    spark.createDataFrame([(5, "s")], "k long, v string").write.parquet(
        f"{root}/{staged}"
    )
    # ... and a rival's in-flight .tmp manifest
    jtmp = spark._jvm.org.apache.hadoop.fs.Path(
        f"{root}/{mf.MANIFEST_DIR}/.tmp-inflight"
    )
    fs = jtmp.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jtmp, True)
    out.write(b"{}")
    out.close()

    mf.vacuum_store(spark, root, keep_generations=1)  # default grace
    jseg = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/{staged}")
    assert fs.exists(jseg) and fs.exists(jtmp)
    # the append completes normally after the vacuum
    mf.commit_append(spark, root, [staged])
    assert _read_ids(spark, root) == [1, 5]
    # expired-manifest refs need NO grace: compact, then vacuum at
    # keep=1 with default grace retires the superseded segments at once
    merged = mf.new_segment_name()
    m = mf.latest_manifest(spark, root)
    mf.read_segments(spark, root, m[1]).coalesce(1).write.parquet(
        f"{root}/{merged}"
    )
    mf.commit_replace(spark, root, [merged])
    before = {
        s.getPath().getName()
        for s in fs.listStatus(spark._jvm.org.apache.hadoop.fs.Path(root))
    }
    assert staged in before
    mf.vacuum_store(spark, root, keep_generations=1)
    after = {
        s.getPath().getName()
        for s in fs.listStatus(spark._jvm.org.apache.hadoop.fs.Path(root))
    }
    assert staged not in after and merged in after
    assert _read_ids(spark, root) == [1, 5]


def test_legacy_adoption_is_durable_so_vacuum_retires_legacy_dirs(
    spark, tmp_path
):
    """ADVICE r11 #5: adopting a pre-manifest layout persists the
    adopted generation-0 manifest on disk, so once newer generations
    supersede it, vacuum retires the bare legacy directories instead of
    leaking them forever (they lack owned prefixes, so only a manifest
    reference can ever mark them dead)."""
    root = str(tmp_path / "store")
    _store(spark, f"{root}/bands", [(1, "a"), (2, "b")])  # pre-r11 layout
    legacy = {"segments": ["bands"]}
    # a REPLACE on the legacy store (the build_* adoption path)
    merged = mf.new_segment_name()
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.parquet(f"{root}/{merged}")
    mf.commit_replace(spark, root, [merged], legacy=legacy)
    # the adoption itself is on disk as generation 0
    assert mf.manifest_at(spark, root, 0)["segments"] == ["bands"]
    gen, man = mf.latest_manifest(spark, root)
    assert gen == 1 and man["segments"] == [merged]
    # once generation 0 expires, the legacy dir is retired with it
    mf.vacuum_store(spark, root, keep_generations=1)
    jband = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/bands")
    fs = jband.getFileSystem(spark._jsc.hadoopConfiguration())
    assert not fs.exists(jband)
    assert _read_ids(spark, root) == [1, 2, 3]


def test_stats_commit_atomically_with_data(spark, tmp_path):
    root = str(tmp_path / "store")
    seg = mf.new_segment_name()
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(
        f"{root}/{seg}"
    )
    mf.commit_append(spark, root, [seg], stats={"n": 2, "dist_sum": 0.5})
    gen, man = mf.latest_manifest(spark, root)
    # caller stats ride the commit untouched; the commit ALSO
    # fingerprints its new segment's schema (r14)
    assert man["stats"]["n"] == 2 and man["stats"]["dist_sum"] == 0.5
    assert set(man["stats"]["segschema"]) == {seg}


def test_multi_segment_commit_fingerprints_threaded_byte_identical(
    spark, tmp_path
):
    """VERDICT r14 #5: a compaction committing MANY segments reads
    footers through a bounded thread pool instead of serially — and the
    resulting segschema entries are byte-identical to the serial
    per-segment computation (the per-segment read is what makes the
    fingerprint sound; only the scheduling changed)."""
    import hashlib

    root = str(tmp_path / "store")
    base = mf.new_segment_name()
    spark.createDataFrame([(0, "z")], "k long, v string").write.parquet(
        f"{root}/{base}"
    )
    mf.commit_append(spark, root, [base])
    new = [mf.new_segment_name() for _ in range(6)]
    for i, seg in enumerate(new):
        spark.createDataFrame(
            [(i, f"v{i}")], "k long, v string"
        ).write.parquet(f"{root}/{seg}")
    mf.commit_compaction(spark, root, new, replaced=[base])
    _gen, man = mf.latest_manifest(spark, root)
    got = man["stats"]["segschema"]
    assert set(got) == set(new)  # replaced segment's entry GC'd
    for seg in new:
        sj = spark.read.parquet(f"{root}/{seg}").schema.json()
        assert got[seg] == hashlib.sha256(
            sj.encode("utf-8")
        ).hexdigest()[:16]


def test_legacy_layout_adopted_on_first_commit(spark, tmp_path):
    root = str(tmp_path / "store")
    _store(spark, f"{root}/bands", [(1, "a"), (2, "b")])  # pre-r11 layout
    legacy = {"segments": ["bands"]}
    # readable through the adoption path before any commit
    gen, man = mf.current_state(spark, root, legacy)
    assert gen == 0 and man["segments"] == ["bands"]
    _append(spark, root, [(3, "c")], legacy=legacy)
    assert _read_ids(spark, root) == [1, 2, 3]
    gen, man = mf.latest_manifest(spark, root)
    assert man["segments"][0] == "bands"


def test_vacuum_retires_expired_generations_only(spark, tmp_path):
    root = str(tmp_path / "store")
    s1 = _append(spark, root, [(1, "a")])
    s2 = _append(spark, root, [(2, "b")])
    # replace (compaction): one merged segment
    merged = mf.new_segment_name()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(f"{root}/{merged}")
    mf.commit_replace(spark, root, [merged])
    # keep 2 generations: gen 2 (the pre-compact append) references
    # BOTH s1 and s2, so both stay readable for in-flight scans
    mf.vacuum_store(spark, root, keep_generations=2)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    exists = lambda d: fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/{d}"))
    assert exists(s1) and exists(s2) and exists(merged)
    assert len(mf._list_generations(spark, root)) == 2
    assert _read_ids(spark, root) == [1, 2]
    # keep 1: only the compacted generation's segment survives
    mf.vacuum_store(spark, root, keep_generations=1)
    assert not exists(s1) and not exists(s2) and exists(merged)
    assert _read_ids(spark, root) == [1, 2]


def test_kill_mid_compact_leaves_store_readable(spark, tmp_path, monkeypatch):
    """The r10 ADVICE finding: delete-then-rename stranded the store on
    a crash between the two. Under the manifest protocol a compaction
    killed (a) before its commit or (b) before its vacuum leaves a
    committed generation readable, and probe results are unchanged."""
    from blockchaintoavro_spark.operators.neardup_index import (
        build_neardup_index,
        compact_neardup_index,
        probe_neardup_index,
        read_neardup_bands,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    root = str(tmp_path / "nd_idx")
    build_neardup_index(mk([(1, a)]), root, kind="minhash")
    probe_neardup_index(mk([(3, c)]), root, append="survivors")

    ids = lambda: {
        r["_nd_id"]
        for r in read_neardup_bands(spark, root).select("_nd_id").distinct().collect()
    }
    assert ids() == {1, 3}

    # (a) kill between segment write and manifest commit
    boom = RuntimeError("killed mid-compact")
    monkeypatch.setattr(
        mf, "commit_compaction",
        lambda *a, **k: (_ for _ in ()).throw(boom),
    )
    with pytest.raises(RuntimeError, match="killed mid-compact"):
        compact_neardup_index(spark, root, n_files=2)
    monkeypatch.undo()
    assert ids() == {1, 3}  # old generation intact, probes keep working
    m = probe_neardup_index(mk([(4, a)]), root, append="none")
    assert {(r["d_new"], r["d_old"]) for r in m.collect()} == {(4, 1)}

    # (b) kill between commit and vacuum
    monkeypatch.setattr(
        mf, "vacuum_store",
        lambda *a, **k: (_ for _ in ()).throw(boom),
    )
    with pytest.raises(RuntimeError, match="killed mid-compact"):
        compact_neardup_index(spark, root, n_files=2)
    monkeypatch.undo()
    assert ids() == {1, 3}  # new generation committed and readable
    # recovery: the next compaction vacuums the leftovers
    out = compact_neardup_index(spark, root, n_files=2)
    assert out["rows"] > 0 and ids() == {1, 3}


def test_ivf_crash_mid_rebuild_keeps_old_index(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Model (centroids), data (assignments) and drift stats publish in
    ONE manifest commit: a rebuild killed after writing everything but
    before the commit leaves the OLD index fully readable and
    consistent — the r10 layout could strand mismatched centroids/
    assignments/stats."""
    from blockchaintoavro_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        "vec_id < 60"
    )
    idx = str(tmp_path / "ivf_atomic")
    sim.build_ivf_index(emb, idx, n_centroids=8, n_iters=1)
    q = emb.filter("vec_id < 5")
    res = lambda: sorted(
        (r.q_id, r.neighbor_id)
        for r in sim.query_ivf(spark, idx, q, k=3, nprobe=8).collect()
    )
    before, stats_before = res(), sim.read_ivf_stats(spark, idx)
    assert stats_before[0] == 60

    boom = RuntimeError("killed mid-rebuild")
    monkeypatch.setattr(
        mf, "commit_replace", lambda *a, **k: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError, match="killed mid-rebuild"):
        sim.rebuild_ivf_index(spark, idx, n_centroids=8, n_iters=2)
    monkeypatch.undo()
    # old generation intact: same results, same stats, queries work
    assert res() == before
    assert sim.read_ivf_stats(spark, idx) == stats_before

    # a successful rebuild then publishes atomically and vacuums the
    # orphans the crashed attempt left behind
    sim.rebuild_ivf_index(spark, idx, n_centroids=8, n_iters=2)
    assert sim.read_ivf_stats(spark, idx)[0] == 60
    assert len(res()) == len(before) > 0


def test_commit_append_retry_folds_stats_after_lost_race(
    spark, tmp_path, monkeypatch
):
    """Optimistic concurrency: a commit that loses the generation race
    retries against the WINNER's manifest — the staged segment is
    reused (no data rewrite), the winner's segments survive, and
    update_stats folds the delta into the winner's stats rather than
    the stale pre-race baseline. With retries=0 the race raises."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])

    rival = mf.new_segment_name()
    spark.createDataFrame([(7, "r")], "k long, v string").write.parquet(
        f"{root}/{rival}"
    )
    mine = mf.new_segment_name()
    spark.createDataFrame([(2, "m")], "k long, v string").write.parquet(
        f"{root}/{mine}"
    )

    real_commit = mf.commit_manifest
    state = {"interfered": 0}

    def racing_commit(sp, rt, man, gen):
        if not state["interfered"]:
            state["interfered"] = 1
            # a rival writer takes this generation first, with its own
            # segment and its own stats
            real_commit(
                sp, rt,
                {
                    "segments": [
                        s for s in man["segments"] if s not in (mine, rival)
                    ]
                    + [rival],
                    "stats": {"n": 4, "dist_sum": 2.0},
                },
                gen,
            )
        return real_commit(sp, rt, man, gen)

    monkeypatch.setattr(mf, "commit_manifest", racing_commit)
    with pytest.raises(mf.ConcurrentCommitError):
        mf.commit_append(
            spark, root, [mine],
            update_stats=lambda old: {
                "n": (old or {}).get("n", 0) + 2,
                "dist_sum": (old or {}).get("dist_sum", 0.0) + 0.5,
            },
            retries=0,
        )
    state["interfered"] = 0
    mf.commit_append(
        spark, root, [mine],
        update_stats=lambda old: {
            "n": (old or {}).get("n", 0) + 2,
            "dist_sum": (old or {}).get("dist_sum", 0.0) + 0.5,
        },
        retries=3,
    )
    monkeypatch.undo()
    gen, man = mf.latest_manifest(spark, root)
    assert rival in man["segments"] and mine in man["segments"]
    # winner's 4 + my 2; the commit also auto-fingerprints (r14)
    assert man["stats"]["n"] == 6 and man["stats"]["dist_sum"] == 2.5
    assert _read_ids(spark, root) == [1, 2, 7]


def test_concurrent_appends_with_retries_all_commit(spark, tmp_path):
    """Four threads appending simultaneously with retries: every append
    lands exactly once, the store reads all rows, and the final
    generation count equals the number of commits."""
    import threading

    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    errs = []

    def worker(v):
        try:
            seg = mf.new_segment_name()
            spark.createDataFrame(
                [(v, "x")], "k long, v string"
            ).write.parquet(f"{root}/{seg}")
            mf.commit_append(spark, root, [seg], retries=16)
        except Exception as e:  # pragma: no cover - the assertion below
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(v,)) for v in (10, 11, 12, 13)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert _read_ids(spark, root) == [1, 10, 11, 12, 13]
    gen, man = mf.latest_manifest(spark, root)
    assert gen == 5 and len(man["segments"]) == 5


def test_compaction_preserves_concurrent_append(spark, tmp_path, monkeypatch):
    """r12: a compaction and an append may interleave — the OPTIMIZE
    conflict rule. The rewrite replaces exactly the segments of the
    snapshot it read; an append that commits BETWEEN the snapshot and
    the compaction's manifest commit must survive (its segment AND its
    stats — the exactly-once fence a streaming applier wrote), instead
    of one side failing or the append being clobbered."""
    root = str(tmp_path / "store")
    s1 = _append(spark, root, [(1, "a")])
    s2 = _append(spark, root, [(2, "b")])

    real_commit = mf.commit_manifest
    state = {"raced": 0, "rival": None}

    def racing(sp, rt, man, gen):
        if not state["raced"]:
            state["raced"] = 1
            rival = mf.new_segment_name()
            state["rival"] = rival
            spark.createDataFrame(
                [(7, "r")], "k long, v string"
            ).write.parquet(f"{rt}/{rival}")
            real_commit(
                sp, rt,
                {"segments": [s1, s2, rival],
                 "stats": {"last_batch_id": 9}},
                gen,
            )
        return real_commit(sp, rt, man, gen)

    monkeypatch.setattr(mf, "commit_manifest", racing)
    snap = mf.latest_manifest(spark, root)
    merged = mf.new_segment_name()
    mf.read_segments(spark, root, snap[1]).coalesce(1).write.parquet(
        f"{root}/{merged}"
    )
    mf.commit_compaction(
        spark, root, [merged], replaced=snap[1]["segments"]
    )
    monkeypatch.undo()

    assert _read_ids(spark, root) == [1, 2, 7]  # append survived
    gen, man = mf.latest_manifest(spark, root)
    assert merged in man["segments"] and state["rival"] in man["segments"]
    assert s1 not in man["segments"] and s2 not in man["segments"]
    assert man["stats"]["last_batch_id"] == 9  # fence preserved
    # the compaction fingerprints its merged segment; GC drops retired
    assert set(man["stats"].get("segschema", {})) <= {
        merged, state["rival"]
    }
    # and vacuum retires the replaced segments without touching either
    mf.vacuum_store(spark, root, keep_generations=1)
    assert _read_ids(spark, root) == [1, 2, 7]


def test_dup_dictionary_refresh_crash_keeps_serving(
    spark, tmp_path, monkeypatch
):
    """The strip dictionary is the 4th standing artifact (r11): a
    refresh killed before its manifest commit leaves the previous
    dictionary generation serving the stream — the old
    ``mode("overwrite")`` delete window stranded it."""
    from blockchaintoavro_spark.operators.substr_sorted import (
        SortedDictStripper,
        read_dup_dictionary,
        write_dup_dictionary,
    )

    base = "x" * 30
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    snap = mk([(1, base + "a"), (2, base + "b")])  # 30-char shared prefix
    dict_path = str(tmp_path / "dup_dict")
    write_dup_dictionary(snap, dict_path, k=20)
    want = {r["sub"] for r in read_dup_dictionary(spark, dict_path).collect()}
    assert want  # the shared prefix produced duplicated fingerprints

    stripper = SortedDictStripper(dict_path, str(tmp_path / "out"), k=20)
    out1 = stripper.strip(mk([(9, base + "c")])).collect()
    assert out1[0]["n_stripped"] > 0 and stripper.refreshes == 1

    boom = RuntimeError("killed mid-refresh")
    monkeypatch.setattr(
        mf, "commit_replace", lambda *a, **k: (_ for _ in ()).throw(boom)
    )
    with pytest.raises(RuntimeError, match="killed mid-refresh"):
        write_dup_dictionary(mk([(5, "completely different text")]),
                             dict_path, k=20)
    monkeypatch.undo()
    # previous generation intact: same dictionary, and the stripper's
    # token is unchanged so it does not even re-broadcast
    assert {
        r["sub"] for r in read_dup_dictionary(spark, dict_path).collect()
    } == want
    out2 = stripper.strip(mk([(10, base + "d")])).collect()
    assert out2[0]["n_stripped"] > 0 and stripper.refreshes == 1

    # a successful refresh flips the token exactly once
    write_dup_dictionary(snap, dict_path, k=20)
    stripper.strip(mk([(11, base + "e")])).collect()
    assert stripper.refreshes == 2


def test_time_travel_reads_pinned_generation(spark, tmp_path):
    """A retained manifest is immutable, so pinning it reproduces the
    store exactly as of that commit — and a vacuumed generation raises
    with the retained list, never a partial read."""
    from blockchaintoavro_spark.operators.neardup_index import (
        build_neardup_index,
        probe_neardup_index,
        read_neardup_bands,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    c = "completely different content about spark shuffles and partitions"
    d = "watermarks bound the state kept for late arriving event time rows"
    root = str(tmp_path / "nd_tt")
    build_neardup_index(mk([(1, a)]), root, kind="minhash")   # gen 1
    probe_neardup_index(mk([(2, c)]), root, append="survivors")  # gen 2
    probe_neardup_index(mk([(3, d)]), root, append="survivors")  # gen 3

    ids_at = lambda g: {
        r["_nd_id"]
        for r in read_neardup_bands(spark, root, generation=g)
        .select("_nd_id").distinct().collect()
    }
    assert ids_at(1) == {1}
    assert ids_at(2) == {1, 2}
    assert ids_at(3) == {1, 2, 3} == {
        r["_nd_id"]
        for r in read_neardup_bands(spark, root)
        .select("_nd_id").distinct().collect()
    }
    mf.vacuum_store(spark, root, keep_generations=2)
    assert ids_at(2) == {1, 2}  # still retained
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        ids_at(1)


def test_time_travel_uniform_across_all_store_readers(spark, tmp_path):
    """Every standing-store reader takes a generation pin: gram counts,
    strip dictionary, IVF assignments and IVFADC codes read back
    exactly as of a retained commit."""
    from blockchaintoavro_spark.operators.pq import (
        build_ivfpq_index,
        append_to_ivfpq_index,
        read_ivfpq_codes,
    )
    from blockchaintoavro_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        read_ivf_assignments,
    )
    from blockchaintoavro_spark.operators.substr_sorted import (
        append_gram_counts,
        read_gram_counts,
        read_dup_dictionary,
        write_dup_dictionary,
    )

    base = "y" * 30
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    store = str(tmp_path / "grams")
    append_gram_counts(mk([(1, base + "a")]), store, k=20)     # gen 1
    append_gram_counts(mk([(2, base + "b")]), store, k=20)     # gen 2
    assert read_gram_counts(spark, store, generation=1).count() < \
        read_gram_counts(spark, store).count()

    dpath = str(tmp_path / "dict")
    write_dup_dictionary(mk([(1, base + "a"), (2, base + "b")]), dpath, k=20)
    write_dup_dictionary(mk([(9, "no dups here at all")]), dpath, k=20)
    assert read_dup_dictionary(spark, dpath).count() == 0
    assert read_dup_dictionary(spark, dpath, generation=1).count() > 0

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(7)),
                    lambda d: (F.col("id") % 5 + d).cast("double") + 0.5)
        .alias("embedding"),
    )
    idx = str(tmp_path / "ivf_tt")
    build_ivf_index(emb.filter("vec_id < 40"), idx, n_centroids=4, n_iters=1)
    append_to_ivf_index(idx, emb.filter("vec_id >= 40"))
    assert read_ivf_assignments(spark, idx, generation=1).count() == 40
    assert read_ivf_assignments(spark, idx).count() == 60

    pidx = str(tmp_path / "ivfpq_tt")
    build_ivfpq_index(emb.filter("vec_id < 40"), pidx,
                      n_centroids=4, m=4, n_codes=4, n_iters=1)
    append_to_ivfpq_index(pidx, emb.filter("vec_id >= 40"))
    assert read_ivfpq_codes(spark, pidx, generation=1).count() == 40
    assert read_ivfpq_codes(spark, pidx).count() == 60


from hypothesis import given, settings
from hypothesis import strategies as st

# a program over the store: each element is one operation
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=3)),
        st.tuples(st.just("crash_append"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=3)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("crash_compact"), st.just(None)),
        st.tuples(st.just("append_mid_compact"),
                  st.lists(st.integers(0, 99), min_size=1, max_size=3)),
        st.tuples(st.just("vacuum"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=6,
)


def _run_random_history(spark, root, ops):
    """The protocol property body, shared by the default-publisher and
    conditional-put-publisher runs (r13 — VERDICT r12 "Next round" #1):
    under ANY interleaving of appends, compactions (snapshot-scoped
    ``commit_compaction``, r12), vacuums, appends landing BETWEEN a
    compaction's snapshot and its commit, and mid-operation crashes
    (data written, commit never issued), every read returns exactly the
    multiset of successfully COMMITTED appends — crashed work is
    invisible, compaction and vacuum are content-neutral, racing
    appends are never lost, and the store is never unreadable."""
    mk = lambda vals: spark.createDataFrame(
        [(v, "x") for v in vals], "k long, v string"
    )
    expected: list[int] = []

    def read_all():
        m = mf.latest_manifest(spark, root)
        if m is None:
            return []
        return sorted(
            r["k"] for r in mf.read_segments(spark, root, m[1]).collect()
        )

    for op, arg in ops:
        if op == "append":
            seg = mf.new_segment_name()
            mk(arg).coalesce(1).write.parquet(f"{root}/{seg}")
            mf.commit_append(spark, root, [seg])
            expected.extend(arg)
        elif op == "crash_append":
            seg = mf.new_segment_name()  # written, never committed
            mk(arg).coalesce(1).write.parquet(f"{root}/{seg}")
        elif op == "compact" and expected:
            seg = mf.new_segment_name()
            m = mf.latest_manifest(spark, root)
            mf.read_segments(spark, root, m[1]).coalesce(1).write.parquet(
                f"{root}/{seg}"
            )
            mf.commit_compaction(
                spark, root, [seg], replaced=m[1]["segments"]
            )
        elif op == "crash_compact" and expected:
            seg = mf.new_segment_name()  # merged data staged, no commit
            m = mf.latest_manifest(spark, root)
            mf.read_segments(spark, root, m[1]).coalesce(1).write.parquet(
                f"{root}/{seg}"
            )
        elif op == "append_mid_compact" and expected:
            # a compactor takes its snapshot, then an append COMMITS
            # before the compaction does — the merge must keep both
            snap = mf.latest_manifest(spark, root)
            merged = mf.new_segment_name()
            mf.read_segments(spark, root, snap[1]).coalesce(1).write.parquet(
                f"{root}/{merged}"
            )
            rival = mf.new_segment_name()
            mk(arg).coalesce(1).write.parquet(f"{root}/{rival}")
            mf.commit_append(spark, root, [rival])
            expected.extend(arg)
            mf.commit_compaction(
                spark, root, [merged], replaced=snap[1]["segments"],
            )
        elif op == "vacuum":
            mf.vacuum_store(spark, root, keep_generations=arg)
        assert read_all() == sorted(expected), (op, arg, ops)
    mf.vacuum_store(spark, root, keep_generations=1)
    assert read_all() == sorted(expected)


@given(ops=_OPS)
@settings(max_examples=12, deadline=None)
def test_manifest_protocol_invariant_under_random_histories(
    spark, tmp_path_factory, ops
):
    """The protocol property through the default ``file:`` publisher
    (``link(2)`` create-if-absent)."""
    root = str(tmp_path_factory.mktemp("mstore") / "store")
    _run_random_history(spark, root, ops)


def _cond_put_local():
    """A TRUE conditional put over the local filesystem — ``os.open``
    with ``O_CREAT|O_EXCL`` is one atomic create-if-absent syscall, the
    same contract as S3 ``If-None-Match: *`` / GCS
    ``ifGenerationMatch=0`` — wrapped through the same
    :func:`manifest.conditional_put_publisher` adapter a real object
    store deployment would register."""
    import os

    def put_if_absent(path: str, payload: bytes) -> bool:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        return True

    return mf.conditional_put_publisher(put_if_absent)


@given(ops=_OPS)
@settings(max_examples=12, deadline=None)
def test_manifest_protocol_invariant_through_conditional_put_publisher(
    spark, tmp_path_factory, ops
):
    """r13 (VERDICT r12 #1 done-criterion): the SAME random-history
    property, with every commit routed through a registered
    conditional-write publisher instead of the built-in link/rename
    primitives — the protocol must be publisher-agnostic."""
    prev = mf.register_commit_publisher("file", _cond_put_local())
    try:
        root = str(tmp_path_factory.mktemp("mstore_cp") / "store")
        _run_random_history(spark, root, ops)
    finally:
        mf.register_commit_publisher("file", prev)


# ---------------------------------------------------------------------------
# pluggable commit publishers + scheme safety (r13, VERDICT r12 #1)


def test_scheme_detection_is_string_level():
    assert mf._scheme_of("/tmp/x/store") == "file"
    assert mf._scheme_of("file:///tmp/x") == "file"
    assert mf._scheme_of("hdfs://nn:8020/warehouse/s") == "hdfs"
    assert mf._scheme_of("s3a://bucket/prefix/store") == "s3a"
    assert mf._scheme_of("gs://bucket/store") == "gs"
    # a relative local path with no scheme separator
    assert mf._scheme_of("rel/path/store") == "file"


def test_object_store_scheme_refused_without_publisher(spark):
    """S3A-family rename is copy+delete behind a client-side exists
    check — the commit must REFUSE instead of silently reintroducing
    the TOCTOU the protocol closed on POSIX (string-level, before any
    FileSystem for the scheme is even resolved)."""
    for root in ("s3a://bucket/store", "gs://bucket/store",
                 "abfss://c@acct.dfs.core.windows.net/store"):
        with pytest.raises(mf.UnsafeCommitSchemeError,
                           match="conditional"):
            mf.commit_manifest(spark, root, {"segments": []}, 1)


def test_single_writer_env_optin_selects_exists_check(monkeypatch):
    monkeypatch.setenv(mf._SINGLE_WRITER_ENV, "s3a, gs")
    assert mf._publisher_for("s3a://b/s") is mf.single_writer_publisher
    assert mf._publisher_for("gs://b/s") is mf.single_writer_publisher
    with pytest.raises(mf.UnsafeCommitSchemeError):
        mf._publisher_for("abfss://c@a/s")  # not opted in


def test_registered_publisher_wins_dispatch():
    sentinel = lambda spark, root, name, payload: True
    prev = mf.register_commit_publisher("s3a", sentinel)
    try:
        assert mf._publisher_for("s3a://bucket/store") is sentinel
    finally:
        mf.register_commit_publisher("s3a", prev)
    # restored: back to refusing
    with pytest.raises(mf.UnsafeCommitSchemeError):
        mf._publisher_for("s3a://bucket/store")


def test_conditional_put_publisher_race_exactly_one_winner(
    spark, tmp_path
):
    """The 8-thread generation race of
    test_commit_point_atomic_exactly_one_winner_per_generation, re-run
    with every commit routed through a conditional-put publisher — the
    atomicity contract must come from the store's conditional write,
    not from link/rename."""
    import threading

    prev = mf.register_commit_publisher("file", _cond_put_local())
    try:
        root = str(tmp_path / "store")
        _append(spark, root, [(1, "a")])  # gen 1, via the publisher
        results: dict[int, str] = {}
        lock = threading.Lock()

        def worker(i):
            try:
                mf.commit_manifest(
                    spark, root, {"segments": [], "stats": {"writer": i}}, 2
                )
                out = "won"
            except mf.ConcurrentCommitError:
                out = "lost"
            with lock:
                results[i] = out

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sorted(results.values()).count("won") == 1
        gen, man = mf.latest_manifest(spark, root)
        winner = next(i for i, r in results.items() if r == "won")
        assert gen == 2 and man["stats"] == {"writer": winner}
    finally:
        mf.register_commit_publisher("file", prev)


# ---------------------------------------------------------------------------
# rival-compaction detection (r13, ADVICE r12 #4)


def test_concurrent_compaction_detected_not_duplicated(spark, tmp_path):
    """Two compactors snapshotting the same manifest: the first commit
    wins; the second must raise ConcurrentCompactionError instead of
    retrying into a manifest that carries BOTH rewrites of the same
    rows (each row doubled — ADVICE r12 #4's failure)."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    _append(spark, root, [(2, "b")])
    snap = mf.latest_manifest(spark, root)

    def stage_merge():
        seg = mf.new_segment_name()
        mf.read_segments(spark, root, snap[1]).coalesce(1).write.parquet(
            f"{root}/{seg}"
        )
        return seg

    first, second = stage_merge(), stage_merge()
    mf.commit_compaction(spark, root, [first], snap[1]["segments"])
    with pytest.raises(mf.ConcurrentCompactionError, match="rival"):
        mf.commit_compaction(spark, root, [second], snap[1]["segments"])
    # the winner's layout stands, content unchanged, loser invisible
    assert _read_ids(spark, root) == [1, 2]
    assert mf.latest_manifest(spark, root)[1]["segments"] == [first]
    # a compaction racing only APPENDS still merges (unchanged r12 rule)
    rival = _append(spark, root, [(3, "c")])
    snap2_segments = [first]
    merged = mf.new_segment_name()
    spark.read.parquet(f"{root}/{first}").coalesce(1).write.parquet(
        f"{root}/{merged}"
    )
    mf.commit_compaction(spark, root, [merged], snap2_segments)
    assert _read_ids(spark, root) == [1, 2, 3]


# ---------------------------------------------------------------------------
# store-clock vacuum (r13, VERDICT r12 #2 / ADVICE r12 #5)


def test_vacuum_grace_uses_store_clock_not_driver_clock(spark, tmp_path):
    """Driver clock 2h AHEAD of the store must not eat the 1h orphan
    grace: 'now' comes from the store's own clock, so an orphan the
    store stamped 'just now' survives even though the driver's wall
    clock says it is hours old."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    staged = mf.new_segment_name()
    spark.createDataFrame([(9, "s")], "k long, v string").write.parquet(
        f"{root}/{staged}"
    )
    jseg = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/{staged}")
    fs = jseg.getFileSystem(spark._jsc.hadoopConfiguration())
    # the store's clock runs 2h behind the driver: it stamped the fresh
    # orphan at ITS own 'now'
    store_now = spark._jvm.java.lang.System.currentTimeMillis() - 7_200_000
    fs.setTimes(jseg, store_now, -1)

    # store-side now (what the probe would read there): age 0 -> survives
    res = mf.vacuum_store(spark, root, keep_generations=1, now_ms=store_now)
    assert fs.exists(jseg) and res["deleted_dirs"] == 0
    # the OLD rule — driver wall clock — would have deleted it
    res = mf.vacuum_store(
        spark, root, keep_generations=1, now_ms=store_now + 7_200_000
    )
    assert not fs.exists(jseg) and res["deleted_dirs"] == 1


def test_store_now_probe_reads_fs_clock_and_leaves_no_residue(
    spark, tmp_path
):
    """The default clock source is a probe file's mtime on the target
    filesystem (locally that IS the system clock, within seconds), and
    the probe never lingers."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    jdir = spark._jvm.org.apache.hadoop.fs.Path(f"{root}/{mf.MANIFEST_DIR}")
    fs = jdir.getFileSystem(spark._jsc.hadoopConfiguration())
    now = mf._store_now_ms(spark, fs, root)
    sys_now = spark._jvm.java.lang.System.currentTimeMillis()
    assert abs(sys_now - now) < 60_000
    leftovers = [
        s.getPath().getName()
        for s in fs.listStatus(jdir)
        if s.getPath().getName().startswith(".tmp-clockprobe-")
    ]
    assert leftovers == []


def test_read_segments_same_schema_single_scan(spark, tmp_path):
    """VERDICT r12 #4: a many-segment same-schema store reads through
    ONE multi-path parquet scan (plan-asserted single leg) instead of a
    unionByName chain with one leg per append; results are identical."""
    import re

    root = str(tmp_path / "store")
    for i in range(6):
        _append(spark, root, [(i * 2, "a"), (i * 2 + 1, "b")])
    m = mf.latest_manifest(spark, root)
    df = mf.read_segments(spark, root, m[1])
    assert sorted(r["k"] for r in df.collect()) == list(range(12))
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scans = len(re.findall(r"^\(\d+\) Scan parquet", p, re.M))
    assert scans == 1, f"expected a single multi-path scan, got {scans}\n{p}"
    assert "Union" not in p
    # filters still push down through the merged scan
    pf = jvm.PythonSQLUtils.explainString(
        df.filter(F.col("k") > 8)._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,8)]" in pf


def test_read_segments_mixed_schema_keeps_union(spark, tmp_path):
    """A mid-evolution store (segments with different shapes) keeps the
    per-leg unionByName path and stays readable."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    seg = mf.new_segment_name()
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, w double"
    ).write.parquet(f"{root}/{seg}")
    with pytest.raises(Exception):
        # schema-widening appends aren't unionByName-able without
        # allowMissingColumns; read_segments must surface that, not
        # silently drop the column via the multi-path first-file schema
        m2 = mf.commit_append(spark, root, [seg])
        m = mf.latest_manifest(spark, root)
        mf.read_segments(spark, root, m[1]).collect()


def _append_with_stats(spark, root, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    seg = mf.new_segment_name()
    df.write.parquet(f"{root}/{seg}")
    mf.commit_append(
        spark, root, [seg],
        update_stats=mf.segment_stats_update(
            {seg: mf.segment_column_stats(df, ["k"])}
        ),
    )
    return seg


def test_segment_stats_prune_skips_non_matching_segments(spark, tmp_path):
    """r13 data skipping: per-segment [min,max] ride the SAME commit as
    the segment; a range probe consults the manifest and scans only
    segments whose range can match — result identical to the full scan,
    plan holds only the pruned paths."""
    import re

    root = str(tmp_path / "store")
    segs = [
        _append_with_stats(spark, root, [(i * 10 + j, "x") for j in range(10)])
        for i in range(4)  # ranges [0,9], [10,19], [20,29], [30,39]
    ]
    gen, man = mf.latest_manifest(spark, root)
    ss = man["stats"]["segstats"]
    assert ss[segs[0]]["k"] == [0, 9] and ss[segs[3]]["k"] == [30, 39]
    pruned = mf.prune_manifest(man, "k", lo=12, hi=25)
    assert pruned["segments"] == [segs[1], segs[2]]
    got = sorted(
        r["k"]
        for r in mf.read_segments(spark, root, pruned)
        .filter("k between 12 and 25")
        .collect()
    )
    want = sorted(
        r["k"]
        for r in mf.read_segments(spark, root, man)
        .filter("k between 12 and 25")
        .collect()
    )
    assert got == want == list(range(12, 26))
    # the pruned plan never references the excluded segments' paths
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        mf.read_segments(spark, root, pruned)._jdf.queryExecution(),
        "formatted",
    )
    assert segs[1] in p or segs[2] in p
    assert segs[0] not in p and segs[3] not in p
    # fully-disjoint probe prunes EVERYTHING -> skip the scan
    assert mf.prune_manifest(man, "k", lo=1000)["segments"] == []
    # unbounded side + unknown-column safety
    assert mf.prune_manifest(man, "k", hi=9)["segments"] == [segs[0]]
    assert len(mf.prune_manifest(man, "other")["segments"]) == 4


def test_segment_stats_compose_with_fence_and_gc_on_compaction(
    spark, tmp_path
):
    """segstats compose with the exactly-once fence in one commit, and
    a compaction retires replaced segments' stats instead of letting
    them accumulate."""
    root = str(tmp_path / "store")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    seg = mf.new_segment_name()
    df.write.parquet(f"{root}/{seg}")
    mf.commit_append(
        spark, root, [seg],
        update_stats=mf.fence_stats(
            7,
            extra=mf.segment_stats_update(
                {seg: mf.segment_column_stats(df, ["k"])}
            ),
            query_id="q1",
        ),
    )
    gen, man = mf.latest_manifest(spark, root)
    assert man["stats"]["fences"]["q1"] == 7
    assert man["stats"]["segstats"][seg]["k"] == [1, 2]
    # compact: merged segment replaces the old one; stale stats GC'd
    merged = mf.new_segment_name()
    mf.read_segments(spark, root, man).coalesce(1).write.parquet(
        f"{root}/{merged}"
    )
    mf.commit_compaction(spark, root, [merged], replaced=[seg])
    gen2, man2 = mf.latest_manifest(spark, root)
    assert man2["segments"] == [merged]
    assert seg not in (man2["stats"].get("segstats") or {})
    assert man2["stats"]["fences"]["q1"] == 7  # fence survives the GC
    # all-NULL column is omitted (never pruned on)
    nul = spark.createDataFrame(
        [(None, "z")], "k long, v string"
    )
    assert mf.segment_column_stats(nul, ["k"]) == {}


from hypothesis import given
from hypothesis import strategies as hst


@given(
    segs=hst.lists(
        hst.tuples(
            hst.lists(hst.integers(-50, 50), max_size=6),  # segment values
            hst.booleans(),  # whether stats were recorded
        ),
        max_size=8,
    ),
    lo=hst.one_of(hst.none(), hst.integers(-60, 60)),
    hi=hst.one_of(hst.none(), hst.integers(-60, 60)),
)
def test_prune_manifest_sound_under_random_stores(segs, lo, hi):
    """Pruning soundness, property-tested in pure Python: a dropped
    segment PROVABLY contains no value in [lo, hi]; a segment whose
    values intersect the range — or whose stats were never recorded —
    is always kept. (Completeness beyond the min/max bound is not
    claimed: [min,max] is a summary, so overlap without a true hit is
    legitimately kept.)"""
    man = {"segments": [], "stats": {"segstats": {}}}
    data = {}
    for i, (values, recorded) in enumerate(segs):
        name = f"seg-{i}"
        man["segments"].append(name)
        data[name] = values
        if recorded and values:
            man["stats"]["segstats"][name] = {
                "k": [min(values), max(values)]
            }
    pruned = set(mf.prune_manifest(man, "k", lo, hi)["segments"])
    in_range = lambda v: (lo is None or v >= lo) and (hi is None or v <= hi)
    for name in man["segments"]:
        has_hit = any(in_range(v) for v in data[name])
        if name not in pruned:
            assert name in man["stats"]["segstats"], "statless seg dropped"
            assert not has_hit, f"{name} dropped but contains a match"
        if has_hit:
            assert name in pruned


_EPOCH = __import__("datetime").datetime(2024, 5, 1)


@given(
    segs=hst.lists(
        hst.lists(hst.integers(0, 300_000), min_size=1, max_size=6),
        max_size=6,
    ),
    lo_s=hst.one_of(hst.none(), hst.integers(-10_000, 310_000)),
    hi_s=hst.one_of(hst.none(), hst.integers(-10_000, 310_000)),
    lo_form=hst.sampled_from(["dt", "T", "space", "date"]),
    hi_form=hst.sampled_from(["dt", "T", "space", "date"]),
)
def test_prune_manifest_timestamp_probe_renderings_sound(
    segs, lo_s, hi_s, lo_form, hi_form
):
    """VERDICT r13 #1: random timestamp stores × probe RENDERINGS —
    datetime objects, 'T'-separated ISO strings, ' '-separated ISO
    strings, bare dates — must never prune a segment containing a
    matching instant. (The 'T' string form was the unsound path:
    ' ' < 'T' at index 10 inverted same-day comparisons.)"""
    from datetime import timedelta

    def inst(sec):
        return _EPOCH + timedelta(seconds=sec)

    def render(sec, form, end):
        t = inst(sec)
        if form == "dt":
            return t
        if form == "T":
            return t.isoformat(sep="T")
        if form == "space":
            return t.isoformat(sep=" ")
        # bare date probe: the operator treats it as the full day —
        # widen the TRUE bound the same way so the assertion matches
        # the documented semantics
        return t.date().isoformat()

    def true_bound(sec, form, end):
        """The instant the rendered probe denotes under the documented
        contract (bare date = whole day)."""
        t = inst(sec)
        if form != "date":
            return t
        day = t.replace(hour=0, minute=0, second=0, microsecond=0)
        return day + timedelta(hours=23, minutes=59, seconds=59,
                               microseconds=999999) if end else day

    man = {"segments": [], "stats": {"segstats": {}}}
    data = {}
    for i, secs in enumerate(segs):
        name = f"seg-{i}"
        man["segments"].append(name)
        vals = [inst(s) for s in secs]
        data[name] = vals
        man["stats"]["segstats"][name] = {
            "ts": [
                min(vals).isoformat(sep=" "),
                max(vals).isoformat(sep=" "),
                "ts",
            ]
        }
    lo = None if lo_s is None else render(lo_s, lo_form, end=False)
    hi = None if hi_s is None else render(hi_s, hi_form, end=True)
    t_lo = None if lo_s is None else true_bound(lo_s, lo_form, end=False)
    t_hi = None if hi_s is None else true_bound(hi_s, hi_form, end=True)
    pruned = set(mf.prune_manifest(man, "ts", lo, hi)["segments"])
    for name, vals in data.items():
        hit = any(
            (t_lo is None or v >= t_lo) and (t_hi is None or v <= t_hi)
            for v in vals
        )
        if hit:
            assert name in pruned, (
                f"{name} wrongly pruned: probe ({lo!r}, {hi!r})"
            )


def test_prune_manifest_legacy_untagged_iso_keeps_on_sep_mismatch():
    """Pre-r14 stores carry timestamp stats as UNTAGGED 2-lists in
    ' '-separated ISO form. A 'T'-separated probe string against them
    is incomparable (the separator byte would invert same-day order) —
    the segment must be KEPT, closing the original unsound path while
    matched-separator compares keep pruning."""
    man = {
        "segments": ["seg-a", "seg-b"],
        "stats": {"segstats": {
            # mx 09:00 is AFTER the probe lo 03:00 — raw lexicographic
            # compare against the 'T' form would wrongly prune it
            "seg-a": {"ts": ["2024-05-06 01:00:00", "2024-05-06 09:00:00"]},
            "seg-b": {"ts": ["2024-05-01 00:00:00", "2024-05-02 00:00:00"]},
        }},
    }
    pruned = mf.prune_manifest(man, "ts", lo="2024-05-06T03:00:00")
    assert pruned["segments"] == ["seg-a", "seg-b"]  # both kept: no lie
    # matched separators still prune (seg-b provably before the lo)
    pruned = mf.prune_manifest(man, "ts", lo="2024-05-06 03:00:00")
    assert pruned["segments"] == ["seg-a"]
    # datetime-object probes work against TAGGED stats
    from datetime import datetime as _dt

    man["stats"]["segstats"]["seg-a"]["ts"].append("ts")
    man["stats"]["segstats"]["seg-b"]["ts"].append("ts")
    pruned = mf.prune_manifest(man, "ts", lo=_dt(2024, 5, 6, 3))
    assert pruned["segments"] == ["seg-a"]
    # and the 'T' probe prunes correctly once stats are tagged
    pruned = mf.prune_manifest(man, "ts", lo="2024-05-06T03:00:00")
    assert pruned["segments"] == ["seg-a"]


def test_segment_stats_skip_unorderable_types(spark):
    """Decimal/binary min-max values have no lossless JSON ordering —
    they are omitted (never pruned on) instead of crashing the commit
    or risking an unsound rounded bound; timestamps record ISO."""
    import json as _json

    df = spark.sql(
        "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d, "
        "CAST('ab' AS BINARY) AS b, "
        "TIMESTAMP '2024-05-06 07:08:09' AS ts, "
        "DATE '2024-05-06' AS dt, 7 AS k"
    )
    st = mf.segment_column_stats(df, ["d", "b", "ts", "dt", "k"])
    assert set(st) == {"ts", "dt", "k"}
    assert st["k"] == [7, 7]
    # temporal stats carry their type tag (r14) so prune_manifest can
    # render probes through the same contract instead of trusting the
    # caller's string rendering
    assert st["ts"] == ["2024-05-06 07:08:09", "2024-05-06 07:08:09", "ts"]
    assert st["dt"] == ["2024-05-06", "2024-05-06", "date"]
    _json.dumps(st)  # the whole dict is manifest-serializable


def test_prune_manifest_keeps_segment_on_type_mismatch():
    """A probe whose bounds don't compare with a segment's recorded
    type (schema evolution, wrong-typed caller) keeps the segment —
    pruning never raises mid-plan and never drops data it can't
    reason about."""
    man = {
        "segments": ["seg-a", "seg-b"],
        "stats": {"segstats": {
            "seg-a": {"k": ["2024-01-01", "2024-02-01"]},
            "seg-b": {"k": [5, 9]},
        }},
    }
    pruned = mf.prune_manifest(man, "k", lo=100)
    assert pruned["segments"] == ["seg-a"]  # b provably < 100; a kept


def test_read_segments_partitioned_store_keeps_pruning(spark, tmp_path):
    """cid-partitioned segments can't ride the multi-path fast path
    (Spark refuses multi-root partition discovery —
    CONFLICTING_DIRECTORY_STRUCTURES), so read_segments must fall back
    to per-leg scans WITH partition pruning intact in every leg."""
    import re

    root = str(tmp_path / "cidstore")
    for b in range(3):
        seg = mf.new_segment_name()
        spark.range(b * 100, (b + 1) * 100).select(
            F.col("id"), (F.col("id") % 8).alias("cid")
        ).write.partitionBy("cid").parquet(f"{root}/{seg}")
        mf.commit_append(spark, root, [seg])
    m = mf.latest_manifest(spark, root)
    df = mf.read_segments(spark, root, m[1])
    q = df.filter(F.col("cid") == 3)
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    scans = len(re.findall(r"^\(\d+\) Scan parquet", p, re.M))
    assert scans == 3  # one leg per segment (fallback, by design)
    assert p.count("PartitionFilters: [isnotnull(cid") == 3
    assert q.count() == 38  # ids ≡ 3 mod 8 in [0, 300)


# ---------------------------------------------------------------------------
# reference HTTP conditional-put publisher (r14, VERDICT r13 #2)


class _CondPutServer:
    """A live conditional-PUT object store: PUT creates iff absent
    (atomically, under one lock) and answers 412 when the name exists —
    the S3 ``If-None-Match: *`` / GCS ``x-goog-if-generation-match: 0``
    contract. ``fail_next`` simulates a 500 so error surfacing is
    testable; ``ignore_conditional`` simulates the older-MinIO-style
    hazard (ADVICE r14 #4): PUT silently OVERWRITES and answers 200,
    never 412. GET serves the stored object so the post-PUT
    verification leg is drivable end to end."""

    def __init__(self):
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        store, lock, state = (
            {},
            threading.Lock(),
            {"fail_next": 0, "ignore_conditional": 0},
        )
        srv = self

        class H(BaseHTTPRequestHandler):
            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                with lock:
                    if state["fail_next"]:
                        state["fail_next"] -= 1
                        self.send_response(500)
                        self.end_headers()
                        return
                    if self.path in store and not state["ignore_conditional"]:
                        self.send_response(412)
                        self.end_headers()
                        return
                    store[self.path] = body
                self.send_response(200)
                self.end_headers()

            def do_GET(self):
                with lock:
                    body = store.get(self.path)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.store, self.state = store, state
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self.thread.start()
        self.port = self.httpd.server_address[1]

    def url_for(self, path):
        return (
            f"http://127.0.0.1:{self.port}/{path.lstrip('/')}",
            {"If-None-Match": "*"},
        )

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def test_http_put_if_absent_race_exactly_one_winner():
    """N threads racing the SAME manifest name through the shipped
    http_put_if_absent: exactly one True, everyone else False (lost
    race), and the stored payload is the winner's — byte-complete."""
    import threading

    srv = _CondPutServer()
    try:
        put = mf.http_put_if_absent(srv.url_for)
        results = {}
        barrier = threading.Barrier(8)

        def racer(i):
            barrier.wait()
            results[i] = put("b/store/_manifests/manifest-0.json",
                             b'{"writer": %d}' % i)

        ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        winners = [i for i, ok in results.items() if ok]
        assert len(winners) == 1
        (stored,) = srv.store.values()
        assert stored == b'{"writer": %d}' % winners[0]
    finally:
        srv.close()


def test_http_put_if_absent_verify_detects_header_ignoring_store():
    """ADVICE r14 #4: a store that silently ignores If-None-Match
    returns 200 on overwrite — WITHOUT verification both racers read
    True and mutual exclusion is silently lost; WITH verify_url_for the
    overwritten loser's post-PUT GET sees the rival's bytes and raises
    instead of claiming the commit."""
    import pytest as _pytest

    srv = _CondPutServer()
    srv.state["ignore_conditional"] = 1
    try:
        name = "b/store/_manifests/manifest-0.json"
        # the hazard, demonstrated: both writers think they created it
        put_blind = mf.http_put_if_absent(srv.url_for)
        assert put_blind(name, b'{"writer": 1}') is True
        assert put_blind(name, b'{"writer": 2}') is True  # silent loss

        # the verified variant: the second PUT overwrote, but a third
        # writer's verification GET must now observe ITS OWN bytes to
        # win — simulate the race loser by racing the store state
        put = mf.http_put_if_absent(srv.url_for, verify_url_for=srv.url_for)
        name2 = "b/store/_manifests/manifest-1.json"
        assert put(name2, b'{"writer": 3}') is True  # uncontended: fine
        # a rival overwrites behind our back between PUT and verify:
        # emulate by pre-poisoning the object the next PUT will verify
        name3 = "b/store/_manifests/manifest-2.json"

        poisoning = {"armed": True}
        orig_url_for = srv.url_for

        def url_for_with_rival(path):
            # after OUR put lands, the rival overwrites before we verify
            if poisoning.pop("armed", None):
                return orig_url_for(path)
            srv.store["/" + path.lstrip("/")] = b'{"writer": "rival"}'
            return orig_url_for(path)

        put_raced = mf.http_put_if_absent(
            url_for_with_rival, verify_url_for=url_for_with_rival
        )
        with _pytest.raises(OSError, match="ignored the conditional"):
            put_raced(name3, b'{"writer": 4}')
    finally:
        srv.close()


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_TEST_URL"),
    reason="SPARK_GRAFT_S3_TEST_URL not set — no live endpoint to test",
)
def test_http_put_if_absent_against_real_endpoint():
    """Opt-in integration leg (VERDICT r14 #6): point
    SPARK_GRAFT_S3_TEST_URL at an anonymously-writable (or presigned)
    prefix on a real S3-compatible endpoint (MinIO, localstack, AWS)
    and this drives the SHIPPED put_if_absent against it: create wins
    once, the rival loses with the store's own conflict status, and
    the read-back verification proves the conditional header was
    honored. Optional SPARK_GRAFT_S3_TEST_HEADERS is a JSON dict of
    auth headers merged into every request."""
    import json as _json
    import uuid as _uuid

    base = os.environ["SPARK_GRAFT_S3_TEST_URL"].rstrip("/")
    extra = _json.loads(os.environ.get("SPARK_GRAFT_S3_TEST_HEADERS", "{}"))

    def url_for(path):
        return f"{base}/{path.lstrip('/')}", {
            "If-None-Match": "*", **extra
        }

    def verify_url_for(path):
        return f"{base}/{path.lstrip('/')}", dict(extra)

    put = mf.http_put_if_absent(url_for, verify_url_for=verify_url_for)
    name = f"_manifests/it-{_uuid.uuid4().hex}.json"
    assert put(name, b'{"writer": "a"}') is True
    # the rival must LOSE — a store that answers True twice here does
    # not honor If-None-Match and must not host manifest commits
    assert put(name, b'{"writer": "b"}') is False


def test_http_put_if_absent_verify_passes_on_honest_store():
    """On a store that honors the header, verification adds one GET and
    changes nothing: winner True, loser False (412 short-circuits
    before any verify)."""
    srv = _CondPutServer()
    try:
        put = mf.http_put_if_absent(srv.url_for, verify_url_for=srv.url_for)
        name = "b/store/_manifests/manifest-0.json"
        assert put(name, b'{"writer": 1}') is True
        assert put(name, b'{"writer": 2}') is False
        (stored,) = srv.store.values()
        assert stored == b'{"writer": 1}'
    finally:
        srv.close()


def test_http_publisher_through_commit_manifest():
    """End-to-end through the registry: a scheme registered with
    conditional_put_publisher(http_put_if_absent(...)) commits
    generation 0 once, raises ConcurrentCommitError on the rival, and
    surfaces server errors instead of reading them as committed."""
    import urllib.error

    import pytest as _pytest

    srv = _CondPutServer()
    prev = mf.register_commit_publisher(
        "mock", mf.conditional_put_publisher(mf.http_put_if_absent(srv.url_for))
    )
    try:
        root = "mock://bucket/store"
        mf.commit_manifest(None, root, {"segments": ["seg-x"]}, 0)
        import json as _json

        (stored,) = srv.store.values()
        assert _json.loads(stored) == {"segments": ["seg-x"]}
        with _pytest.raises(mf.ConcurrentCommitError):
            mf.commit_manifest(None, root, {"segments": ["seg-rival"]}, 0)
        # 5xx surfaces — a network/server failure is never "committed"
        srv.state["fail_next"] = 1
        with _pytest.raises(urllib.error.HTTPError):
            mf.commit_manifest(None, root, {"segments": []}, 1)
        # ...and the name stays free for the retry, which then wins
        mf.commit_manifest(None, root, {"segments": []}, 1)
    finally:
        mf.register_commit_publisher("mock", prev)
        srv.close()


def test_observe_segment_stats_one_scan_and_byte_identical(spark, tmp_path):
    """r14 (VERDICT r13 #3): stats ride the write job via an
    Observation — resolve() launches NO additional job (the old path
    paid a full second aggregate scan) and the rendered dict is
    byte-identical to segment_column_stats over the same rows,
    including the temporal type tags and the omit-unorderable rule."""
    df = spark.sql(
        "SELECT id AS k, CAST(id AS STRING) AS s, "
        "TIMESTAMP '2024-05-06 07:08:09' + make_interval(0,0,0,0,0,0,id) "
        "AS ts, DATE '2024-05-06' AS dt, "
        "CAST(NULL AS INT) AS nul, CAST(id AS DECIMAL(10,2)) AS d "
        "FROM range(100)"
    )
    cols = ["k", "s", "ts", "dt", "nul", "d"]
    want = mf.segment_column_stats(df, cols)
    assert want["ts"][2] == "ts" and want["dt"][2] == "date"
    assert "nul" not in want and "d" not in want
    observed, resolve = mf.observe_segment_stats(df, cols)
    sc = spark.sparkContext
    sc.setJobGroup("obs_one_scan", "observe-stats write")
    try:
        observed.write.parquet(str(tmp_path / "seg"))
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    jobs_after_write = set(tracker.getJobIdsForGroup("obs_one_scan"))
    got = resolve()
    assert got == want
    # resolving the observation cost zero further jobs — the metrics
    # were computed BY the write
    assert set(tracker.getJobIdsForGroup("obs_one_scan")) == jobs_after_write
    all_jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    _ = resolve()  # idempotent re-read of the same observation
    assert len(tracker.getJobIdsForGroup(None) or []) == all_jobs_before


def test_commit_records_schema_fingerprints_and_gc(spark, tmp_path):
    """r14 (VERDICT r13 #4): every commit fingerprints its new
    segments' write schema into stats.segschema; compaction carries
    the surviving entries and GC drops retired ones."""
    root = str(tmp_path / "store")
    s1 = _append(spark, root, [(1, "a")])
    s2 = _append(spark, root, [(2, "b")])
    gen, man = mf.latest_manifest(spark, root)
    fps = man["stats"]["segschema"]
    assert set(fps) == {s1, s2} and fps[s1] == fps[s2]
    # compaction: retired entries GC'd, the merged segment fingerprinted
    merged = mf.new_segment_name()
    mf.read_segments(spark, root, man).coalesce(1).write.parquet(
        f"{root}/{merged}"
    )
    mf.commit_compaction(spark, root, [merged], [s1, s2])
    gen, man = mf.latest_manifest(spark, root)
    assert set(man["stats"]["segschema"]) == {merged}


def test_read_segments_fingerprint_fast_path_probes_one_leg(
    spark, tmp_path
):
    """With full fingerprint coverage the reader decides the
    single-scan path from the manifest: exactly TWO DataFrameReader
    opens (first-leg guard probe + the multi-path scan) no matter how
    many segments accumulated — not one per segment — and the plan
    carries ONE parquet scan node."""
    import re
    from unittest import mock

    from pyspark.sql.readwriter import DataFrameReader

    root = str(tmp_path / "store")
    for i in range(5):
        _append(spark, root, [(i, f"v{i}")])
    gen, man = mf.latest_manifest(spark, root)
    assert len(man["stats"]["segschema"]) == 5
    real = DataFrameReader.parquet
    calls = []

    def counting(self, *paths, **kw):
        calls.append(paths)
        return real(self, *paths, **kw)

    with mock.patch.object(DataFrameReader, "parquet", counting):
        df = mf.read_segments(spark, root, man)
    assert len(calls) == 2, calls
    assert sorted(r["k"] for r in df.collect()) == [0, 1, 2, 3, 4]
    jvm = spark.sparkContext._jvm
    p = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 1
    # a pre-r14 manifest (no fingerprints) still reads correctly via
    # the probing fallback
    man_legacy = dict(man)
    man_legacy["stats"] = {
        k: v for k, v in man["stats"].items() if k != "segschema"
    }
    df = mf.read_segments(spark, root, man_legacy)
    assert sorted(r["k"] for r in df.collect()) == [0, 1, 2, 3, 4]


def test_read_segments_mixed_schema_fallback_intact(spark, tmp_path):
    """Differing fingerprints (mid-evolution store: same columns,
    reordered write shape) keep the per-leg unionByName path — rows
    from both shapes surface with columns aligned by name."""
    root = str(tmp_path / "store")
    _append(spark, root, [(1, "a")])
    seg = mf.new_segment_name()
    spark.createDataFrame(
        [("x", 7)], "v string, k long"
    ).write.parquet(f"{root}/{seg}")
    mf.commit_append(spark, root, [seg])
    gen, man = mf.latest_manifest(spark, root)
    fps = man["stats"]["segschema"]
    assert len(set(fps.values())) == 2
    df = mf.read_segments(spark, root, man)
    assert sorted(r["k"] for r in df.collect()) == [1, 7]


@given(
    segs=hst.lists(
        hst.lists(hst.integers(0, 3650), min_size=1, max_size=6),
        max_size=6,
    ),
    lo_d=hst.one_of(hst.none(), hst.integers(-30, 3700)),
    hi_d=hst.one_of(hst.none(), hst.integers(-30, 3700)),
    lo_form=hst.sampled_from(["date", "dt", "str"]),
    hi_form=hst.sampled_from(["date", "dt", "str"]),
    lo_hour=hst.integers(0, 23),
    hi_hour=hst.integers(0, 23),
)
def test_prune_manifest_date_probe_renderings_sound(
    segs, lo_d, hi_d, lo_form, hi_form, lo_hour, hi_hour
):
    """'date'-tagged stats × probe renderings (date object, datetime
    at an arbitrary hour — floored to its date, ISO date string): a
    segment containing a matching day is never pruned. Datetime
    flooring is conservative for BOTH bounds: mx < lo.date() implies
    every day ends before lo, and mn > hi.date() implies every day
    starts after hi."""
    from datetime import date, datetime, timedelta

    base = date(2020, 1, 1)

    def day(n):
        return base + timedelta(days=n)

    def render(n, form, hour):
        if form == "date":
            return day(n)
        if form == "dt":
            return datetime(2020, 1, 1, hour) + timedelta(days=n)
        return day(n).isoformat()

    man = {"segments": [], "stats": {"segstats": {}}}
    data = {}
    for i, days in enumerate(segs):
        name = f"seg-{i}"
        man["segments"].append(name)
        vals = [day(d) for d in days]
        data[name] = vals
        man["stats"]["segstats"][name] = {
            "d": [min(vals).isoformat(), max(vals).isoformat(), "date"]
        }
    lo = None if lo_d is None else render(lo_d, lo_form, lo_hour)
    hi = None if hi_d is None else render(hi_d, hi_form, hi_hour)
    pruned = set(mf.prune_manifest(man, "d", lo, hi)["segments"])
    # the documented contract: a datetime probe floors to its date
    t_lo = None if lo_d is None else day(lo_d)
    t_hi = None if hi_d is None else day(hi_d)
    for name, vals in data.items():
        hit = any(
            (t_lo is None or v >= t_lo) and (t_hi is None or v <= t_hi)
            for v in vals
        )
        if hit:
            assert name in pruned, (name, lo, hi)


def test_prune_manifest_tz_aware_probes_never_prune():
    """r14 review fix: an AWARE datetime probe renders with an offset
    suffix that sorts above the equal-instant naive stats rendering —
    the exact lexicographic skew typed probes exist to exclude. Aware
    probes (and offset-suffixed ISO strings) are unrenderable: the
    segment is KEPT."""
    from datetime import datetime, timedelta, timezone

    man = {
        "segments": ["seg-a"],
        "stats": {"segstats": {
            "seg-a": {
                "ts": ["2020-01-01 06:00:00", "2020-01-01 12:00:00", "ts"],
                "d": ["2020-01-01", "2020-01-02", "date"],
            }
        }},
    }
    # equal-instant UTC-aware lo: naive compare would prune (mx < lo
    # because of the '+00:00' suffix) — must be kept
    aware = datetime(2020, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    assert mf.prune_manifest(man, "ts", lo=aware)["segments"] == ["seg-a"]
    # a +05:00 probe hours off the naive wall clock — kept either way
    plus5 = datetime(2020, 1, 2, 0, 0, tzinfo=timezone(timedelta(hours=5)))
    assert mf.prune_manifest(man, "ts", lo=plus5)["segments"] == ["seg-a"]
    assert mf.prune_manifest(man, "d", lo=plus5)["segments"] == ["seg-a"]
    # offset-suffixed ISO strings fail the shape check: kept
    assert mf.prune_manifest(
        man, "ts", lo="2020-01-01T12:00:00+00:00"
    )["segments"] == ["seg-a"]
    # the NAIVE equivalents still prune (the fast path is intact)
    assert mf.prune_manifest(
        man, "ts", lo=datetime(2020, 1, 1, 12, 0, 1)
    )["segments"] == []
    assert mf.prune_manifest(
        man, "d", lo=datetime(2020, 1, 3, 0, 0)
    )["segments"] == []


def test_prune_manifest_fraction_and_date_shape_renderings_sound():
    """r14 review round 2: two more rendering-skew paths closed. A
    trailing-zero or short fraction in a string probe is canonicalized
    to the stats rendering (fraction omitted when zero, else exactly
    six digits) before comparing against TAGGED stats; against
    UNTAGGED (pre-r14) stats, fraction-length and date-vs-timestamp
    shape mismatches are incomparable — kept, never pruned."""
    tagged = {
        "segments": ["seg-a"],
        "stats": {"segstats": {
            "seg-a": {"ts": [
                "2024-05-06 01:00:00", "2024-05-06 03:00:00", "ts"
            ]},
        }},
    }
    # equal instant, trailing-zero fraction: naive compare would prune
    # (mx is a strict prefix of lo) — must be kept
    for lo in ("2024-05-06T03:00:00.000000", "2024-05-06 03:00:00.000",
               "2024-05-06T03:00:00.0"):
        assert mf.prune_manifest(tagged, "ts", lo=lo)["segments"] == [
            "seg-a"
        ], lo
    # short fraction on hi: '…00.5' must behave as '…00.500000'
    tagged["stats"]["segstats"]["seg-a"]["ts"] = [
        "2024-05-06 03:00:00.500000", "2024-05-06 09:00:00", "ts"
    ]
    assert mf.prune_manifest(
        tagged, "ts", hi="2024-05-06T03:00:00.5"
    )["segments"] == ["seg-a"]
    # a genuinely-earlier fraction probe still prunes
    assert mf.prune_manifest(
        tagged, "ts", hi="2024-05-06T03:00:00.4"
    )["segments"] == []
    # sub-microsecond digits truncate soundly (lo lowered -> kept)
    assert mf.prune_manifest(
        tagged, "ts", lo="2024-05-06T09:00:00.0000001"
    )["segments"] == ["seg-a"]

    untagged = {
        "segments": ["seg-a"],
        "stats": {"segstats": {
            "seg-a": {"ts": ["2024-05-06 01:00:00", "2024-05-06 09:00:00"]},
        }},
    }
    # bare-date hi against untagged timestamp stats: the date is a
    # PREFIX of every same-day instant, so raw compare would prune the
    # matching segment — must be kept
    assert mf.prune_manifest(untagged, "ts", hi="2024-05-06")[
        "segments"
    ] == ["seg-a"]
    # fraction-length mismatch against untagged stats: kept
    assert mf.prune_manifest(
        untagged, "ts", lo="2024-05-06 09:00:00.000000"
    )["segments"] == ["seg-a"]
    # matched renderings still prune
    assert mf.prune_manifest(
        untagged, "ts", lo="2024-05-06 09:00:01"
    )["segments"] == []


def test_read_segments_names_incompatible_shapes(spark, tmp_path):
    """r16 (found by the cross-applier fault soak): two pipelines with
    different output shapes sharing one store commit fine (fingerprints
    hash, they don't police) — the READ must then fail with an error
    naming the store, segments and both column sets, not a bare
    unionByName resolution error from deep inside a replay."""
    root = str(tmp_path / "mixed")
    a, b = mf.new_segment_name(), mf.new_segment_name()
    spark.createDataFrame(
        [(1, "t")], "doc_id long, text string"
    ).write.parquet(f"{root}/{a}")
    spark.createDataFrame(
        [(2, "c", 0)], "doc_id long, clean_text string, n_stripped long"
    ).write.parquet(f"{root}/{b}")
    mf.commit_append(spark, root, [a])
    mf.commit_append(spark, root, [b])
    _, man = mf.latest_manifest(spark, root)
    with pytest.raises(ValueError, match="incompatible column sets"):
        mf.read_segments(spark, root, man).collect()
