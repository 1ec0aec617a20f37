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


# --------------------------------------------------------------- t-closeness

_TCL_T = 0.2  # the audit threshold (Li, Li & Venkatasubramanian 2007)


@register(
    "dq_t_closeness",
    tags=("compliance", "privacy", "dq", "t-closeness", "emd"),
    oracle=f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0e0) AS INT) AS b
  FROM customer
),
bands AS (SELECT DISTINCT b FROM cust),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_bands FROM bands),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS k
  FROM cust GROUP BY 1, 2
),
gcum AS (
  SELECT b, CAST(SUM(COUNT(*)) OVER (ORDER BY b) AS BIGINT) AS cg
  FROM cust GROUP BY b
),
ccnt AS (
  SELECT c_nationkey, c_mktsegment, b, COUNT(*) AS cnt
  FROM cust GROUP BY 1, 2, 3
),
grid AS (
  SELECT cl.c_nationkey, cl.c_mktsegment, cl.k, bd.b,
         COALESCE(cc.cnt, 0) AS cnt
  FROM classes cl
  CROSS JOIN bands bd
  LEFT JOIN ccnt cc ON cc.c_nationkey = cl.c_nationkey
                   AND cc.c_mktsegment = cl.c_mktsegment
                   AND cc.b = bd.b
),
cum AS (
  SELECT c_nationkey, c_mktsegment, k, b,
         CAST(SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY b) AS BIGINT) AS cc
  FROM grid
),
per_class AS (
  SELECT c.c_nationkey, c.c_mktsegment, c.k,
         CAST(SUM(ABS(c.cc * t.n - g.cg * c.k)) AS BIGINT) AS t_num
  FROM cum c
  JOIN gcum g ON g.b = c.b
  CROSS JOIN tot t
  GROUP BY 1, 2, 3
)
SELECT p.c_nationkey, p.c_mktsegment, p.k, m.m_bands, p.t_num,
       ROUND(CAST(p.t_num AS DOUBLE) / p.k / t.n / (m.m_bands - 1), 9)
         AS t_closeness,
       CAST(p.t_num AS DOUBLE) / p.k / t.n / (m.m_bands - 1) > {_TCL_T}e0
         AS breaches_t
FROM per_class p CROSS JOIN m CROSS JOIN tot t
ORDER BY p.c_nationkey, p.c_mktsegment
""",
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the
    third rung of the release-readiness ladder after `dq_k_anonymity`'s
    k/l census: per QI equivalence class (c_nationkey, c_mktsegment),
    the Earth-Mover's Distance between the class's distribution of the
    ORDERED sensitive attribute (account-balance band
    floor(acctbal/1000)) and the GLOBAL distribution, with unit ground
    distance normalized by (m−1):
    EMD = Σ_i |CDF_class(i) − CDF_global(i)| / (m−1) — the measure
    that catches classes k-anonymity and l-diversity both pass but
    whose sensitive values still skew revealingly.

    Exactness: per-band CDF differences are computed over the COMMON
    denominator k·N as integer numerators |cc_i·N − cg_i·k| (BIGINT —
    bounded by N² per band, ≈ 2.3e16 even at 1.5e8 customers), summed
    exactly, with ONE double division chain t_num/k/N/(m−1) at the end
    (identical op order both engines, 9 dp).

    Scale shape: one (QI, band) grouped count + one QI class census +
    one global band census (all partial-agg map-side); the zero-fill
    grid is classes × bands (bounded ≤ |nations|·|segments|·|bands|,
    never customer-sized); cumulative sums are windows over that
    bounded grid partitioned per class; output ≤ |classes| rows."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int").alias("b"),
    )
    bands = cust.select("b").distinct()
    m = bands.agg(F.count(F.lit(1)).cast("bigint").alias("m_bands"))
    tot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    wg = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    gcum = (
        cust.groupBy("b")
        .agg(F.count(F.lit(1)).alias("_gc"))
        .select("b", F.sum("_gc").over(wg).cast("bigint").alias("cg"))
    )
    ccnt = cust.groupBy("c_nationkey", "c_mktsegment", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(ccnt, ["c_nationkey", "c_mktsegment", "b"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "b",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "k",
        "b",
        F.sum("cnt").over(wc).cast("bigint").alias("cc"),
    )
    per_class = (
        cum.join(F.broadcast(gcum), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "k")
        .agg(
            F.sum(F.abs(F.col("cc") * F.col("n") - F.col("cg") * F.col("k")))
            .cast("bigint")
            .alias("t_num")
        )
    )
    t_val = (
        F.col("t_num").cast("double")
        / F.col("k")
        / F.col("n")
        / (F.col("m_bands") - 1)
    )
    return (
        per_class.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "m_bands",
            "t_num",
            F.round(t_val, 9).alias("t_closeness"),
            (t_val > F.lit(_TCL_T)).alias("breaches_t"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
