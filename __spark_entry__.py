"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every declared operator from SURVEY.md §2 (one builder per
key, ``(spark, sf_dir) -> DataFrame``).
``oracle_sql()`` — DuckDB-dialect twin for each SQL-expressible query
(engine-defined-hash operators — MinHash/SimHash/LSH/multimodal stub — are
intentionally omitted → rows-only check).

Implementation lives in ``blockchaintoavro_spark/`` (plans/ holds the
declared-query registry; operators/, functions/, sources/, streaming/ hold
the engine itself).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blockchaintoavro_spark.plans import load_all  # noqa: E402
from blockchaintoavro_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-way star join
    (revenue by region) — exercises scan, broadcast joins, decimal agg."""
    configure(spark)
    registry = load_all()
    return registry["dq10_star_join"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_all()

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return registry[name].spark(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in sorted(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only driver check)."""
    registry = load_all()
    return {
        name: q.oracle for name, q in sorted(registry.items()) if q.oracle
    }
