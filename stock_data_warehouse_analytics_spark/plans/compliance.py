"""Compliance operators: GDPR right-to-be-forgotten deletion cascade.

The reference warehouse has no deletion story; any production
deployment needs one.  ``dq_deletion_cascade`` sizes a deletion
request before it runs: given a deterministic 5% cohort of customers
(md5-hash membership — the stand-in for an uploaded request list), it
walks the foreign-key cascade customer → orders → lineitem and reports
affected and surviving row counts plus the revenue mass leaving the
fact table — the dry-run every DELETE pipeline executes first.

Scale shape: two hash semi-joins down the FK chain (the cohort is 5%
of a dimension — NOT force-broadcast; the optimizer picks the
strategy, and at 10^9 customers a shuffled hash join is correct), then
a one-row conditional-aggregate report with partial aggregation
upstream.  Revenue sums in exact integer cents (BIGINT), so the report
is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_int60
from ..sources.tables import load_table
from .registry import register

_SQL_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "dq_deletion_cascade",
    tags=("dq", "compliance", "gdpr", "join"),
    oracle=f"""
WITH flagged AS (
  SELECT c_custkey FROM customer
  WHERE {_SQL_H60.format(x="CAST(c_custkey AS VARCHAR)")} % 20 = 0
),
ord AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey IN (SELECT c_custkey FROM flagged)
              THEN 1 ELSE 0 END AS del
  FROM orders
),
li AS (
  SELECT l.l_orderkey, o.del,
         CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem l JOIN ord o ON l.l_orderkey = o.o_orderkey
)
SELECT (SELECT COUNT(*) FROM customer) AS n_customers,
       (SELECT COUNT(*) FROM flagged) AS n_customers_flagged,
       (SELECT COUNT(*) FILTER (WHERE del = 1) FROM ord)
         AS n_orders_cascade,
       (SELECT COUNT(*) FILTER (WHERE del = 0) FROM ord)
         AS n_orders_kept,
       (SELECT COUNT(*) FILTER (WHERE del = 1) FROM li)
         AS n_lineitems_cascade,
       (SELECT COUNT(*) FILTER (WHERE del = 0) FROM li)
         AS n_lineitems_kept,
       (SELECT ROUND(CAST(COALESCE(SUM(cents) FILTER (WHERE del = 1), 0)
                     AS DOUBLE) / 100, 2) FROM li)
         AS revenue_removed
""",
)
def dq_deletion_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR DELETION-CASCADE dry run: size the blast radius of a 5%
    customer deletion cohort down the FK chain customer → orders →
    lineitem before executing it — affected vs surviving rows per
    table and the exact revenue mass removed (integer cents).

    The cohort is the deterministic md5-int60 hash membership
    ``h(c_custkey) % 20 = 0`` — the reproducible stand-in for an
    uploaded request list; membership is partition-invariant.

    Scale shape: one LEFT join + mark flags orders (a semi-join would
    lose the kept side; the kept/cascade split needs both, so the
    cohort rides as a nullable mark — cohort side is 5% of the
    customer DIMENSION, join strategy left to the optimizer), one
    equi-join carries the mark to lineitem, then one-row conditional
    aggregates (partial agg upstream).  No collect, no broadcast of
    data-sized state."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    flagged = cust.filter(
        hash_int60(F.col("c_custkey").cast("string")) % 20 == 0
    ).select("c_custkey")
    ord_marked = orders.join(
        flagged.withColumn("del_mark", F.lit(1)),
        orders["o_custkey"] == flagged["c_custkey"],
        "left",
    ).select(
        "o_orderkey", F.coalesce(F.col("del_mark"), F.lit(0)).alias("del")
    )
    li_marked = li.join(
        ord_marked, li["l_orderkey"] == ord_marked["o_orderkey"]
    ).select(
        F.col("del"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    n_cust = cust.agg(F.count(F.lit(1)).alias("n_customers"))
    n_flag = flagged.agg(F.count(F.lit(1)).alias("n_customers_flagged"))
    ord_rep = ord_marked.agg(
        F.count(F.when(F.col("del") == 1, 1)).alias("n_orders_cascade"),
        F.count(F.when(F.col("del") == 0, 1)).alias("n_orders_kept"),
    )
    li_rep = li_marked.agg(
        F.count(F.when(F.col("del") == 1, 1)).alias("n_lineitems_cascade"),
        F.count(F.when(F.col("del") == 0, 1)).alias("n_lineitems_kept"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("del") == 1, F.col("cents"))), F.lit(0)
            ).cast("double")
            / 100,
            2,
        ).alias("revenue_removed"),
    )
    return (
        n_cust.crossJoin(F.broadcast(n_flag))
        .crossJoin(F.broadcast(ord_rep))
        .crossJoin(F.broadcast(li_rep))
        .select(
            "n_customers",
            "n_customers_flagged",
            "n_orders_cascade",
            "n_orders_kept",
            "n_lineitems_cascade",
            "n_lineitems_kept",
            "revenue_removed",
        )
    )


@register(
    "dq_k_anonymity",
    tags=("compliance", "privacy", "dq"),
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS k,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0e0) AS INT)) AS l
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(CASE WHEN k < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_k_lt_10,
       CAST(SUM(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       ROUND(CAST(SUM(CASE WHEN k < 10 THEN k ELSE 0 END) AS DOUBLE)
             / SUM(k), 6) AS pct_rows_at_risk,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_l_lt_3
FROM classes
""",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy-readiness gate a
    warehouse runs before releasing a quasi-identifier projection
    (Sweeney k-anonymity; Machanavajjhala l-diversity).  QI =
    (c_nationkey, c_mktsegment); sensitive attribute = account-balance
    band floor(acctbal/1000).  Reports the equivalence-class census:
    min/max class size, classes and row mass below k=10, and the
    minimum distinct-sensitive-value count per class (l).

    Scale shape: one hash-partitioned groupBy on the QI pair (the
    class census — partial aggregation map-side), then a one-row
    report agg over the ≤ |nations|×|segments| class table (bounded
    at ANY row count — partial-agg upstream, O(#tasks) rows cross the
    final exchange).  No joins, no windows, no Python."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
        ).alias("l"),
    )
    at_risk = F.sum(F.when(F.col("k") < 10, F.col("k")).otherwise(0))
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.sum(F.when(F.col("k") < 10, 1).otherwise(0))
        .cast("bigint")
        .alias("n_classes_k_lt_10"),
        at_risk.cast("bigint").alias("n_rows_at_risk"),
        F.round(at_risk.cast("double") / F.sum("k"), 6).alias(
            "pct_rows_at_risk"
        ),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_classes_l_lt_3"),
    )
