"""Simulate the correctness driver: import __spark_entry__ fresh, build a
BARE SparkSession (no engine configs), run entry() + every queries()[name]
at sf0.01, run oracle_sql() in a DuckDB connection that only has the nine
table views, compare row-count + columns + order-insensitive value hash."""

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import os

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

# default sf0.01 mirrors the driver; export SIM_SF_DIR=/root/testdata/sf0.1
# to revalidate the whole oracle surface at 10x SF
SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# bare session — as the driver would build it, NOT our tuned factory
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = E.entry(spark)
n = df.count()
print(f"entry(): {n} rows, schema={df.schema.simpleString()}")
assert n >= 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

import datetime
import math
from decimal import Decimal


def canon(v):
    if v is None:
        return r"\N"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        return r"\N" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def vhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


# Round-1 driver lesson: DECIMAL (Spark) and DECIMAL/HUGEINT (DuckDB)
# outputs render scale-sensitively under the driver's canonicalizer and
# hash-diverge even when values are identical — flag them as failures.
from pyspark.sql.types import DecimalType

qs = E.queries()
oracles = E.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracle")
fail = 0
for name, fn in qs.items():
    sdf = fn(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    bad_types = [
        f"spark:{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    if name not in oracles:
        status = "ok" if not bad_types else f"FRAGILE TYPES {bad_types}"
        fail += 1 if bad_types else 0
        print(f"  {name}: rows-only, {len(srows)} rows {status}")
        continue
    rel = con.sql(oracles[name])
    bad_types += [
        f"duck:{c}:{t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if t.startswith("DECIMAL") or t == "HUGEINT"
    ]
    dcols = list(rel.columns)
    drows = rel.fetchall()
    ok_n = len(srows) == len(drows)
    ok_c = sorted(sdf.columns) == sorted(dcols)
    ok_h = vhash(sdf.columns, srows) == vhash(dcols, drows)
    ok_t = not bad_types
    ok = ok_n and ok_c and ok_h and ok_t
    status = "OK" if ok else (
        f"MISMATCH n={ok_n} cols={ok_c} hash={ok_h} types={bad_types or 'ok'}"
    )
    if not ok:
        fail += 1
    print(f"  {name}: {len(srows)} rows {status}")

print("DRIVER-SIM:", "ALL MATCH" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
