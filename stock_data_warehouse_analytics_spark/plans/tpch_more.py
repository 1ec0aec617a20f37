"""Third TPC-H-shaped batch: the canonical query patterns not yet in
the registry — dual conditional line counts (Q12 shape), promo revenue
share (Q14), large-order HAVING + join-back (Q18), dormant-customer
anti-join with a scalar-aggregate threshold (Q22) — plus the generic
wide→long unpivot.

(The testdata schema lacks shipmode/commitdate/phone, so each query
keeps its TPC-H namesake's *plan shape* — the part the optimizer and
the 100 TB story care about — over the columns that exist.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import davg, dsum, sql_davg, sql_dsum
from .registry import register

_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q12_priority_line_counts",
    tags=("join", "conditional-agg", "tpch"),
    oracle=f"""
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS low_line_count,
       {sql_dsum('l_extendedprice')} AS gross_revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '2000-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: one fact-fact join, dual conditional counts in
    a single grouped agg (no second scan, no self-join — the CASE-WHEN
    pivot that replaces N filtered passes with one)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).cast("long").alias("low_line_count"),
            dsum("l_extendedprice").alias("gross_revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_revenue_share",
    tags=("join", "ratio", "tpch"),
    oracle=f"""
SELECT
  ROUND(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
        / {sql_dsum('l_extendedprice * (1 - l_discount)')}, 6) AS promo_share_pct,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a fact⋈dim join.
    Part grows with scale factor, so (like customer in q3/q5) it is NOT
    force-broadcast — AQE chooses while it fits.  Single grouped agg;
    the ratio is two exact moments divided once."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * dsum(promo_rev) / dsum(rev), 6).alias(
                "promo_share_pct"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_orders",
    tags=("join", "having", "tpch"),
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > 300
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate the fact FIRST (HAVING prunes to the
    rare large orders), then join the survivors back to orders and
    customer — the aggregate-before-join ordering that keeps the join
    input at 'qualifying orders' size instead of 'lineitem' size, and
    a TakeOrderedAndProject top-k instead of a global sort."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_Q22_SEGMENTS = ("AUTOMOBILE", "BUILDING", "MACHINERY")


@register(
    "q22_dormant_customers",
    tags=("anti-join", "scalar-subquery", "tpch"),
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_custs,
       {sql_dsum('c_acctbal')} AS total_bal
FROM customer c
WHERE c_mktsegment IN {_Q22_SEGMENTS!r}
  AND c_acctbal > (SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers in target
    segments with NO orders.  The global-average threshold is a
    one-row aggregate cross-joined in (broadcast — never a collect);
    the no-orders predicate is a left_anti join on the orders key
    projection.  Both sides of the anti-join shuffle at most once."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.filter(F.col("c_mktsegment").isin(*_Q22_SEGMENTS))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "olap_unpivot_daily_metrics",
    tags=("reshape", "unpivot", "melt"),
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         {sql_dsum('value')} AS total_value,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM events
  GROUP BY day, event_type
)
SELECT day, event_type, metric, value FROM (
  SELECT day, event_type, 'max_value' AS metric, max_value AS value FROM daily
  UNION ALL
  SELECT day, event_type, 'min_value', min_value FROM daily
  UNION ALL
  SELECT day, event_type, 'total_value', total_value FROM daily
)
ORDER BY day, event_type, metric
""",
)
def olap_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (pandas ``melt`` / ``stack`` — SURVEY §2.8's
    reshape family): the daily per-type rollup melted into
    (day, event_type, metric, value) rows via ``DataFrame.unpivot``,
    which Spark plans as Expand (one pass, rows × metrics output, no
    join, no second scan)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(
        dsum("value").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return daily.unpivot(
        ["day", "event_type"],
        ["total_value", "min_value", "max_value"],
        "metric",
        "value",
    ).orderBy("day", "event_type", "metric")
