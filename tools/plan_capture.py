"""Capture ``explain("formatted")`` for the bench queries into
``plans/r16/<query>_<tag>.txt`` (the optimization round's evidence files)
and print a per-query noop-sink timing + subtree-CPU table.

Usage: python tools/plan_capture.py <tag> [query ...]
  tag     'before' or 'after' (file suffix)
  query   subset of bench-query names; default = every bench=True query

Timing methodology mirrors bench.py (warm-up pass, median of 5) but the
timed action is the noop sink (guide §1.4) so the numbers isolate the
computation from collect()'s row transfer; bench.py itself keeps its
historical collect() action so BENCH rounds stay comparable.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _subtree_cpu_seconds  # noqa: E402
from blockchaintoavro_spark.plans import load_all  # noqa: E402
from blockchaintoavro_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    registry = load_all()
    names = sys.argv[2:] or sorted(n for n, q in registry.items() if q.bench)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-capture")
    jvm = spark.sparkContext._jvm

    # plans first (cheap, no execution)
    for name in names:
        df = registry[name].spark(spark, SF_DIR)
        txt = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")

    # warm-up
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        registry[name].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()

    self_pid = os.getpid()
    print(f"\n{'query':32s} {'wall_med':>9s} {'wall_iqr':>9s} {'cpu_med':>8s}")
    for name in names:
        runs, cpus = [], []
        for i in range(N_RUNS):
            spark.sparkContext.setJobDescription(f"{tag} {name} run{i}")
            c0 = _subtree_cpu_seconds(self_pid)
            t0 = time.perf_counter()
            registry[name].spark(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - t0)
            c1 = _subtree_cpu_seconds(self_pid)
            if c0 is not None and c1 is not None:
                cpus.append(max(0.0, c1 - c0))
        med = statistics.median(runs)
        qs = statistics.quantiles(runs, n=4)
        cpu = statistics.median(cpus) if cpus else float("nan")
        print(f"{name:32s} {med:9.3f} {qs[2]-qs[0]:9.3f} {cpu:8.2f}")


if __name__ == "__main__":
    main()
