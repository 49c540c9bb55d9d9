"""Relational declared queries (SURVEY §2.3 Part B, DQ-01/02/08..22/25/26/29/30).

The reference delegates this entire surface to BigQuery (``etl.sh:2``
publishes to the public dataset; ``Main.java:119-134`` creates the tables) —
here every family is a built-in Spark primitive, declared with a DuckDB
oracle twin. Money math follows the canonicalization contract: decimal-cast
inputs BEFORE aggregation (exact sums), then ROUND(x,2) rendered as DOUBLE
at the output boundary on BOTH sides (DECIMAL-typed outputs render
scale-sensitively and hash-diverge across drivers; oracle integer SUMs are
likewise pinned to BIGINT to avoid DuckDB HUGEINT rendering).

Scale notes per query live in the builder docstrings; the common posture:
filters/projections push to the parquet scan, dims are broadcast, windows
share sorts, no collect() anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_latest
from ..operators.sessionize import sessionize
from ._util import cents, dbl, dec2, exact_sum_fixed, money, t
from .registry import declare

# ---------------------------------------------------------------------------
# scans & projection


@declare("dq01_scan_count", oracle="SELECT COUNT(*) AS n FROM lineitem")
def dq01(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet scan + count — row-group metadata only, no column IO."""
    return t(spark, sf, "lineitem").agg(F.count("*").alias("n"))


@declare(
    "dq02_project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(18,2))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS net
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def dq02(spark: SparkSession, sf: str) -> DataFrame:
    """Projection + decimal-exact arithmetic; scan reads only 4 columns."""
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money(dec2("l_extendedprice") * (1 - dec2("l_discount"))).alias("net"),
    ).orderBy("l_orderkey", "l_linenumber")


@declare(
    "dq08_filters",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01' AND TIMESTAMP '1995-12-31'
      AND l_returnflag IN ('A','R') AND l_quantity < 25
      AND l_linestatus IS NOT NULL AND l_returnflag LIKE '_'
    ORDER BY 1, 2
    """,
)
def dq08(spark: SparkSession, sf: str) -> DataFrame:
    """Predicate family (BETWEEN/IN/LIKE/IS NULL) — all pushed to parquet."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1994-01-01", "1995-12-31")
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_quantity") < 25)
            & F.col("l_linestatus").isNotNull()
            & F.col("l_returnflag").like("_")
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# joins


@declare(
    "dq09_join_inner",
    oracle="""
    SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
)
def dq09(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join; customer is the small build side (broadcast)."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@declare(
    "dq10_star_join",
    oracle="""
    SELECT r_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    bench=True,
)
def dq10(spark: SparkSession, sf: str) -> DataFrame:
    """5-way star join, dims broadcast — only the lineitem⋈orders edge can
    shuffle; at cluster scale co-locating both on orderkey (bucketing)
    removes that too."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    # price_cents * (100 - discount_cents) is the revenue in 1e-4 dollars —
    # integer math in the hot aggregate, decimal only per-group (exact twin
    # of SUM(dec2(price) * (1 - dec2(discount))); see _util.exact_sum_fixed).
    rev_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(money(exact_sum_fixed(rev_e4, 4)).alias("revenue"))
        .orderBy("r_name")
    )


@declare(
    "dq11_left_join",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name ORDER BY c_custkey
    """,
)
def dq11(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + count of the nullable side (zeros included)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@declare(
    "dq12_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def dq12a(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS → left-semi join (no row multiplication)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@declare(
    "dq12_anti_join",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND l.l_shipdate < TIMESTAMP '1995-06-01')
    ORDER BY p_partkey
    """,
)
def dq12b(spark: SparkSession, sf: str) -> DataFrame:
    """NOT EXISTS → left-anti join (date-windowed so the result is
    non-empty at every sf — an always-empty anti-join proves nothing)."""
    p = t(spark, sf, "part")
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") < "1995-06-01")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@declare(
    "dq13_theta_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, p_partkey
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    ORDER BY 1, 2, 3
    """,
)
def dq13(spark: SparkSession, sf: str) -> DataFrame:
    """Equi key + residual range predicate: stays a hash/broadcast join with
    the theta term as a post-filter (NOT a nested-loop) — check the plan."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey")
    )


@declare(
    "dq14_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT MAX(r.ts) FROM events r
            WHERE r.user_id = e.user_id AND r.event_type = 'error'
              AND r.ts <= e.ts) AS asof_ts
    FROM events e WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
)
def dq14(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase, the latest error at-or-before it for
    the same user — union+window operator (operators/asof.py), one shuffle,
    no range-join explosion."""
    ev = t(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    return asof_latest(
        purchases, errors, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["ts"],
    ).select("event_id", "user_id", "ts", F.col("asof_ts")).orderBy("event_id")


# ---------------------------------------------------------------------------
# aggregation


@declare(
    "dq15_agg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                AS DOUBLE) AS sum_base_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2)))
                               * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def dq15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape — hash aggregate with map-side partial agg (automatic);
    decimal-exact money math."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    # Integer fixed-point twins of the decimal money sums (exact; see
    # _util.exact_sum_fixed): discount revenue in 1e-4 dollars, charge in
    # 1e-6 dollars (three 2-dp factors).
    disc_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    charge_e6 = disc_e4 * (100 + cents("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum_fixed(cents("l_quantity"), 2)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_qty"),
            exact_sum_fixed(cents("l_extendedprice"), 2)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("sum_base_price"),
            money(exact_sum_fixed(disc_e4, 4)).alias("sum_disc_price"),
            money(exact_sum_fixed(charge_e6, 6)).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declare(
    "dq16_count_distinct",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def dq16(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to two-phase exact distinct agg."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
        .orderBy("l_returnflag")
    )


@declare(
    "dq17_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3
    """,
)
def dq17(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (Expand + single aggregate)."""
    return (
        t(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# window functions


@declare(
    "dq18_rank_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def dq18(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking + analytic windows; one Exchange + one sort serves all three
    functions (shared window spec)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.lag(dec2("o_totalprice")).over(w).cast("double").alias("prev_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@declare(
    "dq19_window_frames",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                     AS DECIMAL(38,2)) AS DOUBLE) AS mov_sum
    FROM events ORDER BY user_id, event_id
    """,
)
def dq19(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate window with ROWS frame (3-preceding moving sum)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        t(spark, sf, "events")
        .select(
            "user_id",
            "event_id",
            F.sum(dec2("value"))
            .over(w)
            .cast("decimal(38,2)")
            .cast("double")
            .alias("mov_sum"),
        )
        .orderBy("user_id", "event_id")
    )


@declare(
    "dq20_topk",
    oracle="""
    SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def dq20(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k: orderBy+limit compiles to TakeOrderedAndProject (per-partition
    partial top-k, no full sort — the only scalable global-order pattern)."""
    return (
        t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", dec2("o_totalprice").cast("double").alias("total"))
    )


# ---------------------------------------------------------------------------
# set operations


@declare(
    "dq21_union",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    UNION
    SELECT c_nationkey FROM customer
    ORDER BY nationkey
    """,
)
def dq21a(spark: SparkSession, sf: str) -> DataFrame:
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s.union(c).distinct().orderBy("nationkey")


@declare(
    "dq21_intersect",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT
    SELECT c_nationkey FROM customer
    ORDER BY nationkey
    """,
)
def dq21b(spark: SparkSession, sf: str) -> DataFrame:
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s.intersect(c).orderBy("nationkey")


@declare(
    "dq21_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def dq21c(spark: SparkSession, sf: str) -> DataFrame:
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return c.subtract(s).orderBy("nationkey")  # EXCEPT (set, not bag)


@declare(
    "dq21_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT s_nationkey AS nationkey FROM supplier
      UNION ALL
      SELECT c_nationkey FROM customer
    ) u GROUP BY nationkey ORDER BY nationkey
    """,
)
def dq21d(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL (bag union — no dedup shuffle; aggregated for a stable
    hashable result)."""
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return (
        s.unionAll(c)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("nationkey")
    )


@declare(
    "dq21_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def dq21e(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicity-aware, exceptAll)."""
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return c.exceptAll(s).orderBy("nationkey")


@declare(
    "dq21_intersect_all",
    oracle="""
    SELECT s_nationkey AS nationkey FROM supplier
    INTERSECT ALL
    SELECT c_nationkey FROM customer
    ORDER BY nationkey
    """,
)
def dq21f(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL (bag intersection, intersectAll)."""
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    return s.intersectAll(c).orderBy("nationkey")


# ---------------------------------------------------------------------------
# scalar functions


@declare(
    "dq22_string_math",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           SUBSTR(p_name, 1, 5) AS name5,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, '-', p_type) AS brand_type,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           ABS(p_size - 25) AS size_dist,
           MOD(p_partkey, 7) AS key_mod,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CAST(ROUND(SQRT(p_retailprice), 4) AS DECIMAL(38,4)) AS DOUBLE) AS price_sqrt
    FROM part ORDER BY p_partkey
    """,
)
def dq22a(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar string + math functions — all whole-stage-codegen built-ins."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dist"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        dbl(F.sqrt("p_retailprice")).alias("price_sqrt"),
    ).orderBy("p_partkey")


@declare(
    "dq22_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders ORDER BY o_orderkey
    """,
)
def dq22b(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time extraction and truncation."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("month_start"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# arrays & JSON


@declare(
    "dq25_array_fns",
    oracle="""
    SELECT vec_id,
           len(embedding) AS n_dim,
           CAST(CAST(ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS emb_sum
    FROM embeddings ORDER BY vec_id
    """,
)
def dq25(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions (size + sequential-fold sum) — both
    engines sum left-to-right in double, so values match bitwise."""
    e = t(spark, sf, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dim"),
        dbl(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x), 2).alias(
            "emb_sum"
        ),
    ).orderBy("vec_id")


@declare(
    "dq26_json",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events ORDER BY event_id
    """,
)
def dq26(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction over the events.props string column."""
    return (
        t(spark, sf, "events")
        .select("event_id", F.get_json_object("props", "$.k").alias("k"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# event-time windows (batch-checked forms of the streaming operators)


@declare(
    "dq29_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS w, event_type,
           COUNT(*) AS n,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dq29a(spark: SparkSession, sf: str) -> DataFrame:
    """Event-time tumbling window (1h) — batch equivalent of the streaming
    groupBy(window(...)); same results by construction."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            money(F.sum(dec2("value"))).alias("total"),
        )
        .orderBy("w", "event_type")
    )


@declare(
    "dq29_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS w_start,
           COUNT(*) AS n
    FROM events, (SELECT UNNEST([0,1,2,3]) AS k) k
    GROUP BY 1 ORDER BY 1
    """,
)
def dq29b(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding window (1h window, 15m slide): each event lands in exactly 4
    windows; Spark's window() generates them natively."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("w_start"), "n"
        )
        .orderBy("w_start")
    )


@declare(
    "dq30_sessionize",
    bench=True,  # events-backed headline entry: a green bench can no longer
    # mask a broken load_events path (round-2 lesson, ADVICE.md)
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), y AS (
      SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM y GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dq30(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (strict 30-min gap) — gaps-and-islands via
    operators/sessionize.py; streaming twin is session_window.

    r16 audit: Catalyst already prunes the scan to (user_id, ts,
    event_id) through the window — the explicit select just documents
    the intent (guide §2.3) and keeps the pruning robust to opaque
    downstream edits. A psort/REBALANCE barrier before the presentation
    sort was tried and REVERTED: the window+aggregate segment re-executes
    from the materialized user_id exchange cheaply, and the extra AQE
    stage cost more than it saved (interleaved A/B: 1.21 vs 1.47 CPU-s,
    wall 0.62 vs 0.73)."""
    ev = t(spark, sf, "events").select("user_id", "ts", "event_id")
    s = sessionize(ev, key="user_id", ts="ts", gap_minutes=30, tiebreak="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@declare(
    "dq10_star_join_filtered",
    oracle="""
    SELECT n_name,
           CAST(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                     AS DECIMAL(38,2)) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY n_name
    """,
)
def dq10b(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped filtered star join: the date range pushes into the
    orders scan (PushedFilters), the region predicate shrinks the
    broadcast side to one row before any fact row is touched — filter-
    through-join evidence the unfiltered dq10 can't show."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money(
                exact_sum_fixed(
                    cents("l_extendedprice") * (100 - cents("l_discount")), 4
                )
            ).alias("revenue")
        )
        .orderBy("n_name")
    )


@declare(
    "dq13_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    ORDER BY r.r_name, n.n_name
    """,
)
def dq13b(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cross join (Q10) — small×small Cartesian; at scale a cross
    join is only ever sane with one broadcast-sized side (here both are)."""
    r = t(spark, sf, "region").select("r_name")
    n = t(spark, sf, "nation").select("n_name")
    return r.crossJoin(n).orderBy("r_name", "n_name")


@declare(
    "dq17_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3
    """,
)
def dq17b(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (all 4 grouping combinations via one Expand)."""
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
            "n",
        )
    )


@declare(
    "dq17_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3
    """,
)
def dq17c(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (declared via SQL — identical Catalyst plan
    to the DataFrame rollup/cube family)."""
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST, 3
        """
    )


@declare(
    "dq34_percentiles",
    oracle="""
    SELECT lang,
           CAST(CAST(ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 4)
                     AS DECIMAL(38,4)) AS DOUBLE) AS p50,
           CAST(CAST(ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 4)
                     AS DECIMAL(38,4)) AS DOUBLE) AS p90,
           CAST(CAST(ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY n_chars), 4)
                     AS DECIMAL(38,4)) AS DOUBLE) AS p99
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def dq34(spark: SparkSession, sf: str) -> DataFrame:
    """Exact grouped percentiles (linear interpolation) of document length
    by language — corpus length-distribution stats. Spark's `percentile`
    keeps a per-group digest through a two-phase agg; at 100 TB switch to
    `approx_percentile` (t-digest, mergeable, bounded memory) — declared
    exact here so the oracle can match bit-for-bit."""
    d = t(spark, sf, "documents")

    def pct(p: float, name: str):
        return dbl(F.percentile("n_chars", F.lit(p))).alias(name)

    return (
        d.groupBy("lang")
        .agg(pct(0.5, "p50"), pct(0.9, "p90"), pct(0.99, "p99"))
        .orderBy("lang")
    )


@declare(
    "dq35_pivot",
    oracle="""
    SELECT lang,
           CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS src0,
           CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS src1,
           CAST(SUM(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT) AS src2,
           CAST(SUM(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT) AS src3,
           COUNT(*) AS total
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def dq35(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (lang x source contingency counts) with an explicit value
    list. Pinning the pivot values keeps the plan a single two-phase hash
    agg — no extra distinct-values job and a schema that is stable however
    many sources exist at 100 TB."""
    d = t(spark, sf, "documents")
    srcs = ["src0", "src1", "src2", "src3"]
    piv = (
        d.groupBy("lang")
        .pivot("source", srcs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, srcs)
    )
    tot = d.groupBy("lang").agg(F.count("*").alias("total"))
    return (
        piv.join(tot, "lang")
        .select("lang", *[F.col(s).cast("long").alias(s) for s in srcs], "total")
        .orderBy("lang")
    )


@declare(
    "dq36_stats",
    oracle="""
    SELECT lang,
           CAST(CAST(ROUND(stddev_samp(n_chars), 4) AS DECIMAL(38,4)) AS DOUBLE) AS sd_chars,
           CAST(CAST(ROUND(var_samp(n_chars), 4) AS DECIMAL(38,4)) AS DOUBLE) AS var_chars,
           CAST(CAST(ROUND(corr(n_chars, len(string_split(text, ' '))), 4)
                     AS DECIMAL(38,4)) AS DOUBLE) AS corr_ct,
           CAST(CAST(ROUND(covar_samp(n_chars, len(string_split(text, ' '))), 4)
                     AS DECIMAL(38,4)) AS DOUBLE) AS cov_ct
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def dq36(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance of
    doc length vs token count) — single two-phase hash agg; all moments
    are algebraic (partial-merge-able), so the shuffle carries one small
    state row per (lang) regardless of input size."""
    d = t(spark, sf, "documents")
    ntok = F.size(F.split("text", " "))

    def r4(c, name):
        return dbl(c).alias(name)

    return (
        d.groupBy("lang")
        .agg(
            r4(F.stddev_samp("n_chars"), "sd_chars"),
            r4(F.var_samp("n_chars"), "var_chars"),
            r4(F.corr(F.col("n_chars"), ntok), "corr_ct"),
            r4(F.covar_samp(F.col("n_chars"), ntok), "cov_ct"),
        )
        .orderBy("lang")
    )
