"""Fourth TPC-H-shaped batch — the remaining distinctive optimizer
shapes: nation-pair flows (Q7), distribution-of-counts (Q13),
decorrelated per-group-average filter (Q17), disjunctive predicate
pushdown (Q19), and argmin join-back (Q2's essence without partsupp).

(As with ``tpch_more.py``: the testdata schema lacks some TPC-H
columns, so each keeps its namesake's plan shape over what exists.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import davg, dsum, sql_davg, sql_dsum
from .registry import register


@register(
    "q7_nation_pair_volume",
    tags=("join", "multiway", "tpch"),
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name != cn.n_name
  AND l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '2000-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade flows.  The nation dim joins
    twice under different roles (broadcast both — it is truly bounded),
    customer/supplier shuffle with the facts, and the inequality
    filter lands post-join (it references both sides)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(rev).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q13_order_count_distribution",
    tags=("join", "outer", "histogram", "tpch"),
    oracle="""
SELECT c_count, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY n_customers DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    LEFT join so zero-order customers count as 0 (COUNT of a nullable
    key, not COUNT(*)), then a second tiny aggregation over the
    histogram.  Two shuffles, the second over |distinct counts| rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_count"))
    )


@register(
    "q17_small_quantity_revenue",
    tags=("join", "decorrelation", "tpch"),
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey AS pk, 0.5 * {sql_davg('l_quantity')} AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND({sql_dsum('l_extendedprice')} / 7.0, 6) AS avg_weekly_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < half_avg
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below HALF their group's average — the
    correlated-average subquery decorrelated by hand into a grouped agg
    + equi-join (what Catalyst does to the subquery form; written
    explicitly here so the shape is visible and testable).  The
    per-part aggregate reuses the fact's partkey partitioning."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * davg("l_quantity")).alias("half_avg")
    )
    return (
        l.join(part_avg, l.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_weekly_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_PRED = """(
     (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1  AND l_quantity <= 20)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
)"""


@register(
    "q19_disjunctive_revenue",
    tags=("join", "disjunction", "tpch"),
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED}
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of brand/size/quantity conjunctions
    across the join.  The single-side conjuncts each predicate implies
    (brand ∈ {...}, size/qty ranges) are what the optimizer can push
    below the join via CNF conversion; the full disjunction evaluates
    post-join.  One fact⋈dim join, one global agg."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(pred)
        .agg(
            dsum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q2_argmin_price_per_type",
    tags=("join", "argmin", "tpch"),
    oracle="""
WITH mins AS (
  SELECT p_type, MIN(p_retailprice) AS min_price
  FROM part GROUP BY p_type
)
SELECT p.p_type, p.p_partkey, p.p_name, p.p_brand, p.p_retailprice
FROM part p JOIN mins m ON p.p_type = m.p_type AND p.p_retailprice = m.min_price
ORDER BY p.p_type, p.p_partkey
""",
)
def q2_argmin_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's essence: the row(s) achieving a per-group minimum,
    fetched by joining the grouped min back to the base (keeps ALL
    tied rows — the semantics a row_number()=1 formulation silently
    loses; both exist in the registry).  The min table is
    groups-sized → broadcast."""
    p = load_table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("mt")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == F.col("mt")) & (p.p_retailprice == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )
