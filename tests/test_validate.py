"""Expectation checking + MERGE/upsert (operators/validate.py) — rule
semantics (nulls are violations), one-scan plan shape, per-row detail,
and merge matched/unmatched behavior."""

import pytest
from pyspark.sql import functions as F

from blockchaintoavro_spark.operators.validate import (
    check_rows,
    expect,
    merge_upsert,
    validate,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "a"),
        (2, -3.0, "b"),   # violates positive
        (3, None, "c"),   # null metric → violates positive (unknown ≠ pass)
        (4, 5.0, None),   # violates tag_set
        (5, 99.0, "a"),
    ]
    return spark.createDataFrame(rows, "id long, metric double, tag string")


RULES = [
    lambda: expect("metric_positive", F.col("metric") > 0),
    lambda: expect("tag_set", F.col("tag").isNotNull()),
    lambda: expect("id_unique_nonnull", F.col("id").isNotNull()),
]


def test_validate_counts_and_null_semantics(frame):
    got = {r["rule"]: r for r in validate(frame, [r() for r in RULES]).collect()}
    assert got["metric_positive"]["n_violations"] == 2  # -3.0 and NULL
    assert got["tag_set"]["n_violations"] == 1
    assert got["id_unique_nonnull"]["n_violations"] == 0
    assert abs(got["metric_positive"]["violation_rate"] - 0.4) < 1e-12


def test_validate_single_scan_plan(frame):
    """All rules fold into one aggregate over one scan — adding a rule
    must not add a pass over the data."""
    plan = (
        validate(frame, [r() for r in RULES])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1, plan


def test_validate_empty_frame_rates(spark):
    df = spark.createDataFrame([], "id long, metric double, tag string")
    got = validate(df, [expect("m", F.col("metric") > 0)]).collect()
    assert got[0]["n_violations"] == 0 and got[0]["violation_rate"] == 0.0


def test_check_rows_quarantine_detail(frame):
    got = {r["id"]: r["failed_rules"] for r in check_rows(frame, [r() for r in RULES]).collect()}
    assert got == {
        2: ["metric_positive"],
        3: ["metric_positive"],
        4: ["tag_set"],
    }


def test_check_rows_no_shuffle(frame):
    plan = (
        check_rows(frame, [r() for r in RULES])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "old1", 10), (2, "old2", 20), (3, "old3", 30)],
        "k long, name string, v long",
    )
    source = spark.createDataFrame(
        [(2, "new2", 200), (4, "new4", 400)], "k long, name string, v long"
    )
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(target, source, "k").collect()}
    assert got == {
        1: ("old1", 10),    # unmatched target persists
        2: ("new2", 200),   # matched: source wins
        3: ("old3", 30),
        4: ("new4", 400),   # unmatched source inserts
    }


def test_merge_upsert_source_null_values_win(spark):
    """A matched source row carrying NULL overwrites the target value
    (MERGE update semantics) — coalesce would silently resurrect it."""
    target = spark.createDataFrame([(1, "keep")], "k long, name string")
    source = spark.createDataFrame([(1, None)], "k long, name string")
    got = merge_upsert(target, source, "k").collect()
    assert got[0]["name"] is None


def test_merge_upsert_schema_mismatch_raises(spark):
    t = spark.createDataFrame([(1, "a")], "k long, name string")
    s = spark.createDataFrame([(1, 2)], "k long, other long")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(t, s, "k")
