"""CLI parity smoke tests (Main.java:55-105 flag surface → __main__.py):
each reference workflow must run end-to-end through the module
entrypoint against the fixtures."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from blockchaintoavro_spark.__main__ import main
from blockchaintoavro_spark.operators.blocks_etl import publish_transactions
from blockchaintoavro_spark.sources.tables import (
    BLOCKS_PARQUET,
    PRICES_DIR,
    load_blocks,
)


def test_cli_ingest_drain_writes_avro_and_loads_table(spark, tmp_path):
    src = str(tmp_path / "drop")
    load_blocks(spark).filter(F.col("ingest_id") < 100).repartition(3).write.parquet(src)
    workdir = str(tmp_path / "rotated")
    table = str(tmp_path / "table")
    rc = main(
        [
            "ingest",
            "--source", src,
            "--workdir", workdir,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--rotationtime", "600",
            "--table", table,
            "--drain",
        ]
    )
    assert rc == 0
    files = glob.glob(f"{workdir}/window_id=*/*.avro")
    assert files, "ingest produced no rotated .avro files"
    with open(files[0], "rb") as fh:
        assert fh.read(4) == b"Obj\x01"
    assert spark.read.parquet(table).count() == 100


def test_cli_publish_matches_operator(spark, tmp_path):
    out = str(tmp_path / "published")
    rc = main(["publish", "--source", BLOCKS_PARQUET, "--out", out])
    assert rc == 0
    want = publish_transactions(load_blocks(spark)).count()
    assert spark.read.parquet(out).count() == want


def test_cli_prices_ingest(spark, tmp_path):
    out = str(tmp_path / "prices")
    rc = main(["prices", "--source", f"{PRICES_DIR}/*.csv.gz", "--out", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.columns == ["ts", "priceUSD", "volumeBTC"]
    assert got.count() > 0


def test_cli_compact_merges_drop_dir(spark, tmp_path, capsys):
    """`compact` subcommand: many small containers rewrite into one
    target-sized file in a new directory; stats print as one JSON line."""
    import json

    from pyspark.sql import functions as F

    from blockchaintoavro_spark.sources.avro_io import (
        read_ocf_dataset,
        write_ocf_dataset,
    )

    src = str(tmp_path / "cli_drop")
    out = str(tmp_path / "cli_compacted")
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    write_ocf_dataset(df.repartition(8), src)
    rc = main(["compact", "--source", src, "--out", out])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 500 and stats["n_out"] == 1 and stats["n_in"] >= 4
    assert read_ocf_dataset(spark, out).count() == 500


def test_cli_maintain_compacts_standing_store(spark, tmp_path, capsys):
    """r12: the maintain subcommand folds a manifest store's per-ingest
    segments into one and reports the OPTIMIZE stats — the cadence job
    a long-running ingest schedules."""
    import json

    from blockchaintoavro_spark.operators import manifest as mf
    from blockchaintoavro_spark.operators.neardup_index import (
        build_neardup_index,
        probe_neardup_index,
    )

    idx = str(tmp_path / "nd_idx")
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    build_neardup_index(
        mk([(1, "the quick brown fox jumps over the lazy dog today")]),
        idx, kind="minhash",
    )
    for j, txt in enumerate(
        ("spark shuffles partition data across executors by key",
         "watermarks bound state for late arriving event rows")
    ):
        probe_neardup_index(mk([(10 + j, txt)]), idx, append="survivors")
    assert len(mf.latest_manifest(spark, idx)[1]["segments"]) == 3

    rc = main(["maintain", "--store", idx, "--kind", "neardup",
               "--n-files", "2"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kind"] == "neardup" and stats["rows"] > 0
    assert len(mf.latest_manifest(spark, idx)[1]["segments"]) == 1


def test_cli_split_partitions_by_split_and_matches_operator(
    spark, tmp_path, capsys
):
    """r13: the split subcommand writes the corpus partitioned by the
    deterministic split label and the assignment equals the operator's."""
    import json

    from blockchaintoavro_spark.__main__ import main
    from blockchaintoavro_spark.operators.split import hash_split

    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_split")
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    docs.write.parquet(src)
    rc = main(
        [
            "split",
            "--input", src,
            "--output", out,
            "--key", "doc_id",
            "--weights", "train=0.9,holdout=0.1",
            "--salt", "exp1",
        ]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["counts"]) <= {"train", "holdout"}
    got = {
        r["doc_id"]: r["split"]
        for r in spark.read.parquet(out).select("doc_id", "split").collect()
    }
    want = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs, "doc_id", {"train": 0.9, "holdout": 0.1}, salt="exp1"
        ).collect()
    }
    assert got == want and sum(rep["counts"].values()) == 200
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("split=")
    ) == sorted(f"split={s}" for s in rep["counts"])


def test_cli_describe_reports_store_state(spark, tmp_path, capsys):
    """r13: the describe subcommand reports generations, segments,
    fences and data-skip ranges from the manifest alone."""
    import json

    from blockchaintoavro_spark.__main__ import main
    from blockchaintoavro_spark.operators import manifest as mf

    root = str(tmp_path / "store")
    df = spark.createDataFrame([(1, "a"), (5, "b")], "k long, v string")
    seg = mf.new_segment_name()
    df.write.parquet(f"{root}/{seg}")
    mf.commit_append(
        spark, root, [seg],
        update_stats=mf.fence_stats(
            3, query_id="q9",
            extra=mf.segment_stats_update(
                {seg: mf.segment_column_stats(df, ["k"])}
            ),
        ),
    )
    assert main(["describe", "--store", root]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["generation"] == 1 and rep["segments"] == [seg]
    assert rep["fences"] == {"q9": 3}
    assert rep["segstats"][seg]["k"] == [1, 5]
    # r14: the commit-time schema fingerprint is surfaced too
    assert list(rep["segschema"]) == [seg] and len(rep["segschema"][seg]) == 16
    assert rep["live_data_files"] >= 1
    # a non-store path reports manifest: None with exit 1
    assert main(["describe", "--store", str(tmp_path / "nope")]) == 1


def test_cli_vacuum_dry_run_then_real(spark, tmp_path, capsys):
    """r16 (VERDICT r15 #7): the vacuum subcommand — dry-run reports
    exactly what a real run would delete (touching nothing), the real
    run deletes it, and the retained generations stay readable."""
    import json
    import os

    from blockchaintoavro_spark.operators import manifest as mf

    root = str(tmp_path / "store")
    segs = []
    for gen in range(3):
        df = spark.createDataFrame([(gen, f"v{gen}")], "k long, v string")
        seg = mf.new_segment_name()
        df.write.parquet(f"{root}/{seg}")
        segs.append(seg)
        mf.commit_append(spark, root, [seg])
    assert len(mf._list_generations(spark, root)) == 3

    rc = main(["vacuum", "--store", root, "--keep-generations", "1",
               "--dry-run"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert plan["dry_run"] is True
    # generations 1 and 2 expire; their manifests go, but every segment
    # is still referenced by the RETAINED generation 3 (appends union)
    assert plan["would_delete_manifests"] == [
        f"_manifests/{mf._manifest_file(1)}",
        f"_manifests/{mf._manifest_file(2)}",
    ]
    assert plan["would_delete_dirs"] == []
    # dry-run touched nothing
    assert len(mf._list_generations(spark, root)) == 3
    for seg in segs:
        assert os.path.isdir(os.path.join(root, seg))

    rc = main(["vacuum", "--store", root, "--keep-generations", "1"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["deleted_manifests"] == 2
    assert stats["deleted_dirs"] == 0
    assert mf._list_generations(spark, root) == [3]
    got = sorted(
        r["k"] for r in spark.read.parquet(
            *[f"{root}/{s}" for s in segs]
        ).collect()
    )
    assert got == [0, 1, 2]  # retained generation still fully readable


def test_cli_vacuum_dry_run_lists_dead_segment_dirs(spark, tmp_path, capsys):
    """A superseding commit (compaction-style replace) makes the old
    segments dead refs: dry-run must list the DIRECTORIES too."""
    import json
    import os

    from blockchaintoavro_spark.operators import manifest as mf

    root = str(tmp_path / "store2")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    old_seg = mf.new_segment_name()
    df.write.parquet(f"{root}/{old_seg}")
    mf.commit_append(spark, root, [old_seg])
    new_seg = mf.new_segment_name()
    df.write.parquet(f"{root}/{new_seg}")
    # generation 2 references ONLY the new segment
    mf.commit_manifest(spark, root, {"segments": [new_seg]}, 2)

    rc = main(["vacuum", "--store", root, "--keep-generations", "1",
               "--dry-run"])
    assert rc == 0
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert plan["would_delete_dirs"] == [old_seg]
    assert plan["would_delete_manifests"] == [f"_manifests/{mf._manifest_file(1)}"]
    assert os.path.isdir(os.path.join(root, old_seg))  # untouched

    rc = main(["vacuum", "--store", root, "--keep-generations", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"deleted_dirs": 1, "deleted_manifests": 1,
                   "dry_run": False, "store": root}
    assert not os.path.exists(os.path.join(root, old_seg))
    assert os.path.isdir(os.path.join(root, new_seg))
