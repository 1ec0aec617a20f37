"""OLAP query plans over the TPC-H-ish testdata.

Each query exercises one or more operator classes from SURVEY.md §2 on
the driver's tables, mirroring the reference's stock queries:

- ``q1_pricing_summary``   scan→filter→multi-agg→sort, the flagship
  (reference analog: stats panel ``olap_analysis.py:56-63``)
- ``olap_pivot_quarterly_price``  A1 pivot_table analog
  (``olap_analysis.py:43``: avg Close by (Year,Quarter) × Ticker)
- ``olap_pivot_monthly_volume``   A2 analog (``olap_analysis.py:51``)
- ``olap_yearly_growth``   A4 unstack+arithmetic analog
  (``olap_analysis.py:46-48``)
- ``olap_stats_panel``     A5 named multi-agg + CV (``olap_analysis.py:56-62``)
- ``top_parts_by_revenue`` O3 sort-desc + limit (``olap_analysis.py:62``)

Scale notes: single-pass grouped aggregations (partial + final hash
aggregate, one shuffle on the group keys); pivots use an explicit value
list so the plan is static (no driver-side distinct pass); top-k is
``orderBy().limit()`` → TakeOrderedAndProject, no full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import (
    davg,
    dstddev_samp,
    dsum,
    sql_davg,
    sql_dstddev_samp,
    sql_dsum,
)
from .registry import register

# Orderpriority domain — fixed vocabulary, passed explicitly to pivot()
# so Spark skips the values-discovery job (SURVEY.md §4.2 item 4).
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _pcol(p: str) -> str:
    return "p" + p.split("-")[0]


@register(
    "q1_pricing_summary",
    tags=("agg", "filter", "sort", "flagship"),
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  SUM(l_quantity)                                        AS sum_qty,
  {sql_dsum('l_extendedprice')}                          AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')}       AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  (SUM(l_quantity) / COUNT(l_quantity))                  AS avg_qty,
  {sql_davg('l_extendedprice')}                          AS avg_price,
  {sql_davg('l_discount')}                               AS avg_disc,
  COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2003-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → grouped multi-agg → sort.

    l_quantity is integral-valued, so its double SUM is exact (< 2^53)
    without the decimal detour; money sums use exact decimal moments.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2003-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "olap_pivot_quarterly_price",
    tags=("agg", "pivot", "time-dims"),
    oracle=f"""
SELECT
  YEAR(o_orderdate) AS year,
  QUARTER(o_orderdate) AS quarter,
  {', '.join(f'''ROUND({sql_davg(f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END")}, 2) AS {_pcol(p)}''' for p in PRIORITIES)}
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def olap_pivot_quarterly_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analog (olap_analysis.py:43): avg value by (Year,Quarter) pivoted
    by category, rounded to 2 — as groupBy().pivot().agg()."""
    o = load_table(spark, sf_dir, "orders")
    df = (
        o.select(
            F.year("o_orderdate").alias("year"),
            F.quarter("o_orderdate").alias("quarter"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("year", "quarter")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.round(davg("o_totalprice"), 2))
    )
    renames = {p: _pcol(p) for p in PRIORITIES}
    return df.withColumnsRenamed(renames).orderBy("year", "quarter")


@register(
    "olap_pivot_monthly_volume",
    tags=("agg", "pivot", "time-dims"),
    oracle=f"""
SELECT
  YEAR(o_orderdate) AS year,
  MONTH(o_orderdate) AS month,
  {', '.join(f'''CAST(COALESCE(ROUND({sql_davg(f"CASE WHEN o_orderpriority = '{p}' THEN o_totalprice END")}, 0), 0) AS BIGINT) AS {_pcol(p)}''' for p in PRIORITIES)}
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def olap_pivot_monthly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 analog (olap_analysis.py:51): monthly pivot, round(0) →
    fillna(0) → int cast, reproducing the pandas post-processing chain."""
    o = load_table(spark, sf_dir, "orders")
    df = (
        o.select(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            "o_orderpriority",
            "o_totalprice",
        )
        .groupBy("year", "month")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.round(davg("o_totalprice"), 0))
    )
    for p in PRIORITIES:
        df = df.withColumn(p, F.coalesce(F.col(f"`{p}`"), F.lit(0.0)).cast("long"))
    return df.withColumnsRenamed({p: _pcol(p) for p in PRIORITIES}).orderBy(
        "year", "month"
    )


@register(
    "olap_yearly_growth",
    tags=("agg", "pivot", "derived"),
    oracle=f"""
WITH yearly AS (
  SELECT
    o_orderpriority AS priority,
    {sql_davg("CASE WHEN YEAR(o_orderdate) = 1998 THEN o_totalprice END")} AS y1998,
    {sql_davg("CASE WHEN YEAR(o_orderdate) = 1999 THEN o_totalprice END")} AS y1999
  FROM orders
  GROUP BY 1
)
SELECT priority, ROUND(y1998, 2) AS y1998, ROUND(y1999, 2) AS y1999,
       ROUND((y1999 / y1998 - 1) * 100, 2) AS growth_pct
FROM yearly
ORDER BY priority
""",
)
def olap_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog (olap_analysis.py:46-48): per-category avg by year,
    unstacked wide, then same-row growth arithmetic (J2 — not a join)."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").alias("year"),
            "o_totalprice",
        )
        .groupBy("priority")
        .pivot("year", [1998, 1999])
        .agg(davg("o_totalprice"))
        .withColumnsRenamed({"1998": "y1998", "1999": "y1999"})
    )
    return wide.select(
        "priority",
        F.round("y1998", 2).alias("y1998"),
        F.round("y1999", 2).alias("y1999"),
        F.round((F.col("y1999") / F.col("y1998") - 1) * 100, 2).alias("growth_pct"),
    ).orderBy("priority")


@register(
    "olap_stats_panel",
    tags=("agg", "stats"),
    oracle=f"""
SELECT
  l_returnflag,
  ROUND({sql_davg('l_extendedprice')}, 2)         AS gia_tb,
  ROUND({sql_davg('l_quantity')}, 2)              AS volume_tb,
  ROUND({sql_dstddev_samp('l_extendedprice')}, 2) AS bien_dong_std,
  ROUND({sql_dstddev_samp('l_extendedprice')} / {sql_davg('l_extendedprice')} * 100, 2) AS cv_pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY volume_tb DESC, l_returnflag
""",
)
def olap_stats_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 analog (olap_analysis.py:56-62): named multi-agg with sample
    stddev (pandas ddof=1) and derived CV%, sorted desc by a metric (O3)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(davg("l_extendedprice"), 2).alias("gia_tb"),
            F.round(davg("l_quantity"), 2).alias("volume_tb"),
            F.round(dstddev_samp("l_extendedprice"), 2).alias("bien_dong_std"),
            F.round(
                dstddev_samp("l_extendedprice") / davg("l_extendedprice") * 100, 2
            ).alias("cv_pct"),
        )
        .orderBy(F.desc("volume_tb"), "l_returnflag")
    )


@register(
    "top_parts_by_revenue",
    tags=("join", "agg", "topk"),
    oracle=f"""
SELECT p_partkey, p_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name
ORDER BY revenue DESC, p_partkey
LIMIT 20
""",
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+J: revenue per part, top-20. Aggregates on the fact-side key
    FIRST (shuffle carries ~|part| rows, not |lineitem|), then broadcast
    joins the part dim — the plan that survives a 100× lineitem scale-up.
    p_partkey tiebreak keeps the limit deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    rev = (
        l.select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        )
        .groupBy("l_partkey")
        .agg(dsum("disc_price").alias("revenue"))
    )
    return (
        rev.join(F.broadcast(p), rev.l_partkey == p.p_partkey)
        .select("p_partkey", "p_name", "revenue")
        .orderBy(F.desc("revenue"), "p_partkey")
        .limit(20)
    )
