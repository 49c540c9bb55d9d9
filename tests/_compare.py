"""Local engine↔oracle comparison harness, mirroring the driver's check:
row count + column names + order-insensitive canonicalized value comparison
(columns sorted by name). Canonicalization per FIXTURES.md §4."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from blockchaintoavro_spark.schemas import TESTDATA_TABLES

NULL = r"\N"


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return NULL
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Sort columns by name, render cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["|".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def run_spark(df) -> tuple[list[str], list[tuple]]:
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def run_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def render_fragile_types(df, con, sql: str) -> list[str]:
    """Output-boundary type lint (round-1 driver finding): DECIMAL-typed
    Spark outputs and DECIMAL/HUGEINT DuckDB outputs render scale- or
    width-sensitively under external canonicalizers, so identical values
    can hash-diverge. Declared queries must ship DOUBLE/BIGINT outputs on
    both sides; any hit here is a defect even when values match locally."""
    from pyspark.sql.types import DecimalType

    bad = [
        f"spark col {f.name} is {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    rel = con.sql(sql)
    bad += [
        f"oracle col {c} is {t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t.startswith("DECIMAL") or t == "HUGEINT"
    ]
    return bad


def compare(df, con, sql: str, name: str = "") -> list[str]:
    """Return a list of problems (empty == match)."""
    problems = [f"{name}: fragile output type ({p})"
                for p in render_fragile_types(df, con, sql)]
    s_cols, s_rows = run_spark(df)
    d_cols, d_rows = run_duck(con, sql)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_canon = canon_rows(s_cols, s_rows)
    d_canon = canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diff_s = [r for r in s_canon if r not in set(d_canon)][:5]
        diff_d = [r for r in d_canon if r not in set(s_canon)][:5]
        problems.append(
            f"{name}: values differ; spark-only={diff_s} duck-only={diff_d}"
        )
    return problems
