"""Two independent DRIVER PROCESSES racing the manifest commit point
(VERDICT r15 #6): the in-process 8-thread race exercises ``link(2)``
inside one JVM; the real deployment shape is two drivers. Both legs
race ``commit_manifest`` on the SAME generation from two spawned
processes behind a barrier — exactly one winner, the loser surfaces
``ConcurrentCommitError`` and retries cleanly on the next generation.

Leg 1: the ``file:`` publisher (stage + ``Files.createLink``) with a
full SparkSession per process — two JVMs, two kernels' views of one
directory; the kernel's EEXIST is the arbiter.
Leg 2: the HTTP conditional-PUT publisher against one live
``If-None-Match: *`` store — no Spark needed in the racers, the
store's atomic create-if-absent is the arbiter.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest


def _race_file_commit(root: str, tag: str, barrier, q) -> None:
    """Spawned worker: own SparkSession, race generation 1, retry via
    commit_append on loss."""
    from pyspark.sql import SparkSession

    from blockchaintoavro_spark.operators import manifest as mf

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"racer-{tag}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        os.makedirs(os.path.join(root, f"seg-{tag}"), exist_ok=True)
        barrier.wait(timeout=120)
        try:
            mf.commit_manifest(
                spark, root, {"segments": [f"seg-{tag}"]}, 1
            )
            q.put((tag, "won", 1))
        except mf.ConcurrentCommitError:
            # clean retry: re-read the winner's state, append on top
            man = mf.commit_append(
                spark, root, [f"seg-{tag}"], retries=3
            )
            q.put((tag, "lost", sorted(man["segments"])))
    except Exception as e:  # surfaced by the parent's assertion
        q.put((tag, "error", repr(e)))
    finally:
        spark.stop()


def test_two_driver_processes_race_file_commit(tmp_path):
    root = str(tmp_path / "store")
    os.makedirs(root, exist_ok=True)
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_race_file_commit, args=(root, tag, barrier, q))
        for tag in ("a", "b")
    ]
    for p in procs:
        p.start()
    results = {}
    for _ in procs:
        tag, outcome, detail = q.get(timeout=300)
        results[tag] = (outcome, detail)
    for p in procs:
        p.join(timeout=60)
    outcomes = sorted(o for o, _ in results.values())
    assert outcomes == ["lost", "won"], results
    loser = next(t for t, (o, _) in results.items() if o == "lost")
    # the loser's retry appended on top of the winner's manifest
    assert results[loser][1] == ["seg-a", "seg-b"], results
    # final on-disk state: generation 2 references BOTH segments
    mdir = os.path.join(root, "_manifests")
    files = sorted(os.listdir(mdir))
    assert len([f for f in files if f.endswith(".json")]) == 2
    with open(os.path.join(mdir, files[-1])) as f:
        final = json.load(f)
    assert sorted(final["segments"]) == ["seg-a", "seg-b"]


def _race_http_commit(port: int, tag: str, barrier, q) -> None:
    """Spawned worker: no Spark — the conditional-PUT publisher is pure
    HTTP; race generation 1, retry at generation 2 on loss."""
    from blockchaintoavro_spark.operators import manifest as mf

    def url_for(path):
        return (
            f"http://127.0.0.1:{port}/{path.lstrip('/')}",
            {"If-None-Match": "*"},
        )

    mf.register_commit_publisher(
        "mock", mf.conditional_put_publisher(mf.http_put_if_absent(url_for))
    )
    try:
        barrier.wait(timeout=60)
        try:
            mf.commit_manifest(
                None, "mock://store", {"segments": [f"seg-{tag}"]}, 1
            )
            q.put((tag, "won"))
        except mf.ConcurrentCommitError:
            mf.commit_manifest(
                None, "mock://store",
                {"segments": [f"seg-{tag}", "retry"]}, 2,
            )
            q.put((tag, "lost"))
    except Exception as e:
        q.put((tag, f"error: {e!r}"))


def test_two_processes_race_conditional_put_commit():
    from tests.test_manifest import _CondPutServer

    srv = _CondPutServer()
    try:
        ctx = mp.get_context("spawn")
        barrier = ctx.Barrier(2)
        q = ctx.Queue()
        procs = [
            ctx.Process(
                target=_race_http_commit,
                args=(srv.port, tag, barrier, q),
            )
            for tag in ("a", "b")
        ]
        for p in procs:
            p.start()
        results = dict(q.get(timeout=120) for _ in procs)
        for p in procs:
            p.join(timeout=30)
        assert sorted(results.values()) == ["lost", "won"], results
        winner = next(t for t, o in results.items() if o == "won")
        loser = next(t for t, o in results.items() if o == "lost")
        # the stored generation-1 object is the WINNER's payload,
        # byte-complete; the loser's retry landed as generation 2
        stored = {
            path: json.loads(body) for path, body in srv.store.items()
        }
        assert len(stored) == 2, sorted(stored)
        gen1 = next(v for k, v in stored.items() if k.endswith("1.json"))
        gen2 = next(v for k, v in stored.items() if k.endswith("2.json"))
        assert gen1["segments"] == [f"seg-{winner}"]
        assert gen2["segments"] == [f"seg-{loser}", "retry"]
    finally:
        srv.close()
