"""Engine-vs-DuckDB differential tests over every declared query with an
oracle (the same check the driver runs at sf0.01; here at sf0.001 for
speed — set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to reproduce the
driver's scale)."""

from __future__ import annotations

import pytest

from blockchaintoavro_spark.plans import load_all
from tests._compare import compare

REGISTRY = load_all()
ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    problems = compare(df, duck, q.oracle, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_and_stable_schema(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
