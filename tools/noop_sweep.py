"""One-pass noop-sink sweep over EVERY declared query (guide §1.4).

Prints per-query wall + process-subtree CPU, sorted by CPU descending,
so optimization rounds can rank hotspots across the whole declared
surface instead of only the 12 bench queries. Single pass (no median):
this is a ranking instrument, not a benchmark — anything that stands
out gets a proper interleaved A/B before being believed.

Usage: python tools/noop_sweep.py [out.json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _subtree_cpu_seconds  # noqa: E402
from blockchaintoavro_spark.plans import load_all  # noqa: E402
from blockchaintoavro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    registry = load_all()
    spark = get_spark("noop-sweep")
    self_pid = os.getpid()
    rows = {}
    for name in sorted(registry):
        spark.sparkContext.setJobDescription(f"sweep {name}")
        c0 = _subtree_cpu_seconds(self_pid)
        t0 = time.perf_counter()
        try:
            registry[name].spark(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            err = None
        except Exception as e:  # keep sweeping; record the failure
            err = f"{type(e).__name__}: {e}"[:200]
        wall = time.perf_counter() - t0
        c1 = _subtree_cpu_seconds(self_pid)
        cpu = max(0.0, c1 - c0) if c0 is not None and c1 is not None else None
        rows[name] = {"wall": round(wall, 3), "cpu": round(cpu, 2) if cpu is not None else None}
        if err:
            rows[name]["err"] = err
        print(f"{name:40s} {wall:8.3f} {cpu if cpu is not None else float('nan'):8.2f}"
              + (f"  ERR {err}" if err else ""), flush=True)

    ranked = sorted(rows.items(), key=lambda kv: -(kv[1]["cpu"] or 0))
    print("\n== top 30 by CPU ==")
    for name, r in ranked[:30]:
        cpu = r["cpu"] if r["cpu"] is not None else float("nan")
        print(f"{name:40s} {r['wall']:8.3f} {cpu:8.2f}")
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print(f"wrote {sys.argv[1]}")


if __name__ == "__main__":
    main()
