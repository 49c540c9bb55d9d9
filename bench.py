#!/usr/bin/env python3
"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = per-query wall clock of plan + execution (df.collect()), after a
small warm-up query so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchaintoavro_spark.plans import load_all
from blockchaintoavro_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: flagship ETL, star join, Q1-style agg, cosine top-k,
# token top-k (declared bench=True in the registry)


def main() -> None:
    registry = load_all()
    bench_set = {n: q for n, q in sorted(registry.items()) if q.bench}
    spark = get_spark("bench")

    # warm-up: JVM, codegen, parquet footer caches
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name, q in bench_set.items():
        t0 = time.perf_counter()
        df = q.spark(spark, SF_DIR)
        df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
