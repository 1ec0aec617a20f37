"""Join / set-operation / multidimensional-grouping plans.

The reference's only true join is the broadcast stats-enrichment J1
(``datavisualization.py:760-763``); the warehouse framing ("comparative
analysis", README.md:17) implies the full join family, which Spark gives
built-in.  Each query here exercises one family member with the join
strategy you'd pick at 100 TB:

- dims (region/nation/part/supplier/customer) are bounded → broadcast;
- fact-fact joins shuffle on the join key with partial aggregation
  pushed below the join where semantics allow;
- semi/anti express EXISTS/NOT EXISTS without materializing the right
  side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import davg, dsum, sql_davg, sql_dsum
from .registry import register


@register(
    "q3_shipping_priority",
    tags=("join", "agg", "topk", "filter"),
    oracle=f"""
SELECT
  l_orderkey,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-06-30'
  AND l_shipdate  > TIMESTAMP '1999-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → semi-reduce of the fact,
    shuffle join of the two facts, grouped agg, top-10.

    Customer is *not* force-broadcast: it grows with scale factor, so a
    hard ``F.broadcast`` would OOM at 100× where AQE's size-based choice
    (broadcast while the filtered side fits, shuffle beyond) stays safe.
    orders⋈lineitem shuffles on orderkey — the one unavoidable big-join
    shuffle.
    """
    cutoff = F.lit("1999-06-30").cast("timestamp_ntz")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("disc_price").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_nation_revenue",
    tags=("join", "agg", "multiway"),
    oracle=f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join — bounded dims (region/nation/
    supplier) force-broadcast, the customer-derived side left to AQE
    (it grows with scale factor, so forcing a broadcast would OOM at
    100×), the single fact-fact (orders⋈lineitem) shuffle on orderkey,
    plus the local-supplier equality closing the snowflake."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")

    asia_cust = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        o.join(asia_cust, o.o_custkey == F.col("c_custkey"))
        .select("o_orderkey", "c_nationkey", "n_name")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "join_semi_customers_with_urgent",
    tags=("join", "semi", "agg"),
    oracle="""
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def join_semi_customers_with_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having ≥1 urgent order, counted
    per nation.  Semi keeps only the probe side's columns — no payload
    duplication, no fan-out."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


@register(
    "join_anti_customers_inactive_2001",
    tags=("join", "anti", "agg"),
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def join_anti_customers_inactive_2001(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no 2001+ orders."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_outer_order_counts",
    tags=("join", "outer", "agg"),
    oracle="""
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
  GROUP BY c.c_custkey
)
GROUP BY n_orders
ORDER BY n_orders
""",
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving unmatched rows (COUNT of the null-able
    side = 0) → histogram of per-customer 'P'-order counts.  J1's
    enrichment shape (datavisualization.py:760-763) generalized."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "P"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


@register(
    "set_union_accounts",
    tags=("setop", "union"),
    oracle="""
SELECT kind, nationkey, COUNT(*) AS n, CAST(SUM(CAST(acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
FROM (
  SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
GROUP BY kind, nationkey
ORDER BY kind, nationkey
""",
)
def set_union_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — union-all with schema alignment (unionByName), the Spark
    equivalent of ``pd.concat(sort=False)`` (preprocess_stocks.py:211)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        c.unionByName(s)
        .groupBy("kind", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum("acctbal").alias("total_bal"))
        .orderBy("kind", "nationkey")
    )


@register(
    "set_except_intersect_nations",
    tags=("setop", "except", "intersect"),
    oracle="""
SELECT 'only_big_cust' AS side, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  EXCEPT
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
)
UNION ALL
SELECT 'both' AS side, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
  INTERSECT
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
)
ORDER BY side, nationkey
""",
)
def set_except_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT (distinct flavors) — free Spark capability noted
    in SURVEY.md §2.8."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    only = c.subtract(s)  # EXCEPT (distinct semantics)
    both = c.intersect(s)  # INTERSECT (distinct semantics)
    return (
        only.select(F.lit("only_big_cust").alias("side"), "nationkey")
        .unionByName(both.select(F.lit("both").alias("side"), "nationkey"))
        .orderBy("side", "nationkey")
    )


@register(
    "olap_rollup_revenue",
    tags=("agg", "rollup", "grouping-sets"),
    oracle=f"""
SELECT
  YEAR(o_orderdate) AS year,
  o_orderpriority   AS priority,
  GROUPING(YEAR(o_orderdate)) AS g_year,
  GROUPING(o_orderpriority)   AS g_priority,
  {sql_dsum('o_totalprice')} AS revenue,
  COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP(YEAR(o_orderdate), o_orderpriority)
ORDER BY g_year, g_priority, year, priority
""",
)
def olap_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (year → priority → grand total) with GROUPING
    flags — the cube/rollup capability SURVEY.md §2.5 marks as free."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("year"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return (
        o.rollup("year", "priority")
        .agg(
            F.grouping("year").cast("int").alias("g_year"),
            F.grouping("priority").cast("int").alias("g_priority"),
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("year", "priority", "g_year", "g_priority", "revenue", "n_orders")
        .orderBy("g_year", "g_priority", "year", "priority")
    )


@register(
    "olap_cube_avg_price",
    tags=("agg", "cube", "grouping-sets"),
    oracle=f"""
SELECT
  l_returnflag, l_linestatus,
  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
  ROUND({sql_davg('l_extendedprice')}, 2) AS avg_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
""",
)
def olap_cube_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all 2^2 grouping sets in one
    pass (Spark expands then single shuffle)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.round(davg("l_extendedprice"), 2).alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


@register(
    "agg_distinct_counts",
    tags=("agg", "distinct"),
    oracle="""
SELECT
  l_returnflag,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_suppliers,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/A14 — exact distinct aggregation (expand + two-phase agg in
    Spark; at 100 TB prefer approx_count_distinct, exposed separately as
    a rows-only query since HLL sketches differ across engines)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_distinct",
    tags=("agg", "approx", "sketch"),
    oracle=None,  # HLL sketches are engine-specific — rows-only check
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB-scale path for
    distinct counting.  No oracle: sketch estimates are engine-specific;
    driver records the weaker rows-only check.  Accuracy substitute:
    tests/test_fast_aggregates.py::test_hll_estimate_within_rsd_band
    pins the estimate within 5·rsd of the exact countDistinct at both
    sf0.01 and sf0.1."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.approx_count_distinct("l_suppkey", 0.01).alias("approx_suppliers"),
        )
        .orderBy("l_returnflag")
    )
