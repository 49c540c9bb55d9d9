#!/usr/bin/env python3
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = per-query wall clock of plan + execution (df.collect()): one
untimed warm-up pass over the whole set (JVM/codegen/arrow startup would
otherwise be billed to whichever query runs first), then median of 5
runs. ``spread`` records each query's interquartile range (VERDICT r4
#7): dq10/dq15 moved ±14% between identical plans across rounds, so the
IQR is what separates a real regression from warm-JVM jitter. The
r1-r4 keys (metric/value/unit/queries/sf) are unchanged so rounds stay
comparable; ``spread`` is additive.
"""

from __future__ import annotations

import statistics

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchaintoavro_spark.plans import load_all
from blockchaintoavro_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

# headline set (declared bench=True in the registry): flagship ETL, star
# join, Q1-style agg, sessionize, cosine top-k, token top-k, plus the
# LLM-pipeline ops (r3 VERDICT #2): minhash near-dup, dedup clustering,
# training-prep composite, and the round-5 surface (r5 VERDICT #4):
# substring dedup, MERGE upsert, JPEG decode — existing keys are
# unchanged so rounds stay comparable; new keys are additive


def _parse_sf(sf_dir: str):
    """'…/sf0.1' → 0.1; a custom dir without the sf convention reports
    its basename verbatim instead of a silently-wrong number."""
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        tail = base[2:]
        try:
            return float(tail)
        except ValueError:
            pass
    return base


def main() -> None:
    registry = load_all()
    bench_set = {n: q for n, q in sorted(registry.items()) if q.bench}
    spark = get_spark("bench")

    # warm-up pass: JVM, codegen paths, parquet footers — untimed
    for name, q in bench_set.items():
        q.spark(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, q in bench_set.items():
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = q.spark(spark, SF_DIR)
            df.collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        qs = statistics.quantiles(runs, n=4)  # [q1, median, q3]
        spreads[name] = round(qs[2] - qs[0], 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "runs": N_RUNS,
                "sf": _parse_sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
