"""CLI twin of the reference daemon — ``python -m blockchaintoavro_spark``.

The reference is launched as a long-running Java process with a required
flag set (``Main.java:55-105``); this entrypoint exposes the same surface
so a user of the reference can run the same three workflows (ingest →
rotated Avro + table load; publish/flatten; price ingest) against the
Spark engine. Flag mapping:

| reference (Main.java)     | here                | notes |
|---------------------------|---------------------|-------|
| ``-w/--workdir``          | ``--workdir``       | rotated ``.avro`` staging dir (AvroWriter.java:38-67) |
| ``-b/--bucket``           | ``--table``         | post-rotation destination; Spark's path-based save covers object stores via Hadoop connectors, so "upload to bucket + BQ load" collapses to one append (Main.java:195-259) |
| ``-bd/-bt`` dataset/table | ``--table``         | same collapse |
| ``-r/--rotationtime``     | ``--rotationtime``  | seconds per rotation window (Main.java:73-76) |
| ``-t/--threads``          | ``--threads``       | conversion parallelism → ``local[N]`` + shuffle partitions (Main.java:68-71); ignored when a session already exists |
| ``-d/--dblocation``       | ``--checkpoint``    | resume state: the daemon's block DB ↔ Spark's streaming checkpoint |

The P2P network layer is out of engine scope (SURVEY §2.1 S1): ``ingest``
replays/watches a parquet drop directory instead, which is the same
replayable-source reduction the streaming tests use.
"""

from __future__ import annotations

import argparse
import os
import sys


def _session(threads: int | None):
    if threads:
        os.environ.setdefault("SPARK_GRAFT_CPUS", str(threads))
    from .session import get_spark

    return get_spark("blockchaintoavro-cli")


def cmd_ingest(args) -> int:
    """Drop-dir → rotated Avro windows (+ optional table load).

    ``--drain`` processes everything currently in the source and stops
    (Trigger.AvailableNow — the testable/backfill mode); without it the
    query keeps watching the directory at the rotation cadence, like the
    daemon's continuous loop.
    """
    from .operators.rotation import read_rotated
    from .streaming.pipeline import read_block_stream, start_rotating_sink

    spark = _session(args.threads)
    schema = spark.read.parquet(args.source).schema
    stream = read_block_stream(spark, args.source, schema)
    query = start_rotating_sink(
        stream,
        args.workdir,
        args.checkpoint,
        rotation_seconds=args.rotationtime,
        processing_trigger=None if args.drain else f"{args.rotationtime} seconds",
        dedup_key=args.dedup_key,
    )
    if args.drain:
        query.awaitTermination()
        if args.table:
            # the BigQuery-load analog (Main.java:229-232): append the
            # rotated windows into the destination table
            read_rotated(spark, args.workdir).write.mode("append").parquet(
                args.table
            )
    else:  # pragma: no cover - continuous mode isn't exercised in tests
        query.awaitTermination()
    return 0


def cmd_publish(args) -> int:
    """etl.sh analog: dedup → flatten transactions → published table
    (idempotent overwrite, like the reference's CREATE OR REPLACE)."""
    from .operators.blocks_etl import publish_transactions

    spark = _session(args.threads)
    blocks = spark.read.parquet(args.source)
    publish_transactions(blocks).write.mode("overwrite").parquet(args.out)
    return 0


def cmd_prices(args) -> int:
    """ingest_prices.sh analog: gzipped headerless CSVs with the declared
    3-column schema → prices table."""
    from .plans.blocks_queries import PRICES_SCHEMA

    spark = _session(args.threads)
    (
        spark.read.schema(PRICES_SCHEMA)
        .option("header", "false")
        .csv(args.source)
        .write.mode("overwrite")
        .parquet(args.out)
    )
    return 0


def cmd_compact(args) -> int:
    """Rewrite a rotated drop directory's small files into ~target-size
    Avro containers (the maintenance job a long-running daemon needs:
    file count grows with tasks x windows; readers pay per-file
    overhead). Always writes a NEW directory — swap is the operator's
    atomic rename."""
    import json as _json

    from .sources.avro_io import compact_ocf_dir

    spark = _session(args.threads)
    stats = compact_ocf_dir(
        spark, args.source, args.out,
        target_mb=args.target_mb,
        partition_col=args.partition_col,
    )
    print(_json.dumps(stats))
    return 0


def cmd_maintain(args) -> int:
    """OPTIMIZE + VACUUM for a manifest-pinned standing store: fold the
    per-ingest/per-batch segments back into one (band index, IVF/IVFADC
    code tables, gram-count LSM, scrubber output) and retire expired
    generations. Append-safe (manifest.commit_compaction) — a segment
    committed mid-compaction is carried forward; run on a cadence like
    any lakehouse OPTIMIZE job."""
    import json as _json

    spark = _session(args.threads)
    kind = args.kind
    if kind == "neardup":
        from .operators.neardup_index import compact_neardup_index as fn
    elif kind == "ivf":
        from .operators.similarity import compact_ivf_index as fn
    elif kind == "ivfpq":
        from .operators.pq import compact_ivfpq_index as fn
    elif kind == "grams":
        from .operators.substr_sorted import compact_gram_counts as fn
    else:  # scrub-output
        from .operators.neardup_index import compact_scrub_output as fn
    stats = fn(
        spark, args.store,
        n_files=args.n_files,
        keep_generations=args.keep_generations,
    )
    print(_json.dumps({"kind": kind, **stats}))
    return 0


def cmd_vacuum(args) -> int:
    """Retention for a manifest-pinned standing store: keep the newest
    N generations, delete expired manifests and the directories only
    they referenced, and retire aged-out orphans (VACUUM, the
    lakehouse retention job — operators/manifest.py:vacuum_store).
    ``--dry-run`` prints exactly what would be deleted and touches
    nothing; run it first on any store you did not write yourself."""
    import json as _json

    from .operators import manifest as mf

    spark = _session(args.threads)
    stats = mf.vacuum_store(
        spark, args.store,
        keep_generations=args.keep_generations,
        orphan_grace_seconds=args.orphan_grace_seconds,
        dry_run=args.dry_run,
    )
    print(_json.dumps({"store": args.store, "dry_run": args.dry_run,
                       **stats}, sort_keys=True))
    return 0


def cmd_split(args) -> int:
    """Deterministic train/val/test split of a parquet table: assign
    each row a split label as a pure function of md5(key||salt)
    (operators/split.py — stable under re-partitioning/re-ingest,
    leakage-safe when keyed on a group id) and write the result
    partitioned by split. The assignment is a zero-shuffle projection;
    partitionBy routes rows at write time without an exchange."""
    import json as _json

    from pyspark.sql import functions as F

    from .operators.split import hash_split

    weights = {}
    for part in args.weights.split(","):
        name, w = part.split("=", 1)
        weights[name.strip()] = float(w)
    spark = _session(args.threads)
    df = spark.read.parquet(args.input)
    out = hash_split(df, args.key, weights, salt=args.salt)
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    counts = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    print(_json.dumps({"output": args.output, "counts": counts}))
    return 0


def cmd_describe(args) -> int:
    """Inspect a manifest-pinned standing store without touching data:
    retained generations, live segments (with any committed data-skip
    ranges), model refs, exactly-once fences, and live data-file count
    — the operational DESCRIBE for debugging a stream or planning a
    maintain run. Reads only the manifest JSONs (O(#segments), never
    rows)."""
    import json as _json

    from .operators import manifest as mf

    spark = _session(args.threads)
    gens = mf._list_generations(spark, args.store)
    m = mf.latest_manifest(spark, args.store)
    if m is None:
        print(_json.dumps({"store": args.store, "manifest": None}))
        return 1
    gen, man = m
    stats = man.get("stats") or {}
    report = {
        "store": args.store,
        "generation": gen,
        "retained_generations": gens,
        "segments": man.get("segments", []),
        "refs": man.get("refs", {}),
        "fences": stats.get("fences", {}),
        "last_batch_id": stats.get("last_batch_id"),
        "segstats": stats.get("segstats", {}),
        "segschema": stats.get("segschema", {}),
        "live_data_files": mf.live_data_file_count(spark, args.store),
    }
    print(_json.dumps(report, sort_keys=True))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m blockchaintoavro_spark",
        description=__doc__.split("\n", 1)[0],
    )
    p.add_argument("--threads", "-t", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help=cmd_ingest.__doc__.split("\n", 1)[0])
    ing.add_argument("--source", required=True, help="block drop directory (parquet)")
    ing.add_argument("--workdir", "-w", required=True, help="rotated .avro output dir")
    ing.add_argument("--checkpoint", "-d", required=True, help="streaming state dir")
    ing.add_argument("--rotationtime", "-r", type=int, default=600)
    ing.add_argument("--table", "-b", default=None, help="destination table dir (load step)")
    ing.add_argument("--dedup-key", default=None)
    ing.add_argument("--drain", action="store_true", help="process available data, then stop")
    ing.set_defaults(fn=cmd_ingest)

    pub = sub.add_parser("publish", help=cmd_publish.__doc__.split("\n", 1)[0])
    pub.add_argument("--source", required=True, help="blocks table (parquet)")
    pub.add_argument("--out", required=True, help="published transactions dir")
    pub.set_defaults(fn=cmd_publish)

    pr = sub.add_parser("prices", help=cmd_prices.__doc__.split("\n", 1)[0])
    pr.add_argument("--source", required=True, help="csv[.gz] glob/dir")
    pr.add_argument("--out", required=True, help="prices table dir")
    pr.set_defaults(fn=cmd_prices)

    co = sub.add_parser("compact", help=cmd_compact.__doc__.split("\n", 1)[0])
    co.add_argument("--source", required=True, help=".avro drop directory")
    co.add_argument("--out", required=True, help="NEW compacted output directory")
    co.add_argument("--target-mb", type=int, default=128)
    co.add_argument("--partition-col", default=None)
    co.set_defaults(fn=cmd_compact)

    ma = sub.add_parser(
        "maintain", help=cmd_maintain.__doc__.split("\n", 1)[0]
    )
    ma.add_argument("--store", required=True, help="standing-store root dir")
    ma.add_argument(
        "--kind", required=True,
        choices=["neardup", "ivf", "ivfpq", "grams", "scrub-output"],
    )
    ma.add_argument("--n-files", type=int, default=None)
    ma.add_argument("--keep-generations", type=int, default=2)
    ma.set_defaults(fn=cmd_maintain)

    va = sub.add_parser("vacuum", help=cmd_vacuum.__doc__.split("\n", 1)[0])
    va.add_argument("--store", required=True, help="standing-store root dir")
    va.add_argument(
        "--keep-generations", type=int, default=2,
        help="retained manifest generations (readers mid-scan need one)",
    )
    va.add_argument(
        "--orphan-grace-seconds", type=float, default=3600.0,
        help="age an unreferenced seg-*/.tmp-* must reach before "
        "deletion (protects concurrent appenders' staged work)",
    )
    va.add_argument(
        "--dry-run", action="store_true",
        help="print what would be deleted; touch nothing",
    )
    va.set_defaults(fn=cmd_vacuum)

    sp = sub.add_parser("split", help=cmd_split.__doc__.split("\n", 1)[0])
    sp.add_argument("--input", required=True, help="source parquet path")
    sp.add_argument("--output", required=True, help="destination dir")
    sp.add_argument(
        "--key", required=True,
        help="split key column (a GROUP id makes the split leakage-safe)",
    )
    sp.add_argument(
        "--weights", default="train=0.8,val=0.1,test=0.1",
        help="name=weight[,name=weight...]",
    )
    sp.add_argument(
        "--salt", default="",
        help="re-deal the assignment for a new experiment",
    )
    sp.set_defaults(fn=cmd_split)

    de = sub.add_parser(
        "describe", help=cmd_describe.__doc__.split("\n", 1)[0]
    )
    de.add_argument("--store", required=True, help="standing-store root dir")
    de.set_defaults(fn=cmd_describe)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
