"""OLAP depth operators: windowed Pareto skyline and Kendall rank
correlation.

Two classic analytic shapes the OLAP family lacked: the SKYLINE
(Börzsönyi et al. 2001 — "best tradeoff" points no other row
dominates), computed with the sort+running-max window formulation
instead of the naive O(n²) NOT-EXISTS; and Kendall's τ-b (the robust
rank correlation next to the Pearson matrix in
``operators/stock_stats.py``), computed from exact integer pair counts
over a calendar-bounded daily table.

Cross-engine exactness: money quantizes to integer cents before any
comparison; skyline membership and pair classification are pure
integer predicates; τ-b's final ratio is one deterministic double
expression over BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "olap_skyline_per_brand",
    tags=("olap", "skyline", "pareto", "window"),
    oracle="""
WITH pts AS (
  SELECT p_brand,
         CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) AS cents,
         p_size
  FROM part
),
per_x AS (
  SELECT p_brand, cents, MAX(p_size) AS max_size
  FROM pts GROUP BY p_brand, cents
),
flagged AS (
  SELECT p_brand, cents, max_size,
         COALESCE(MAX(max_size) OVER (
           PARTITION BY p_brand ORDER BY cents DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS best_above
  FROM per_x
)
SELECT p_brand,
       ROUND(cents::DOUBLE / 100, 2) AS price,
       max_size AS size
FROM flagged
WHERE max_size > best_above
ORDER BY p_brand, cents DESC
""",
)
def olap_skyline_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO SKYLINE per brand: the (price, size) points no other
    part of the same brand dominates (≥ in both, > in one) — the
    "show me the efficient frontier" OLAP operator (Börzsönyi et al.
    2001), maximizing both dimensions.

    Scale shape: NOT the naive O(n²) NOT-EXISTS — prices collapse to
    one row per (brand, cents) with the max size (one grouped
    aggregate), then a single per-brand window sorted by cents DESC
    keeps a row iff its size beats the running max of all
    strictly-more-expensive rows: dominance in 2D reduces to one
    running max, O(n log n), partitioned by brand (no global sort).
    Money quantizes to integer CENTS before grouping and the running
    max is integer, so frontier membership is bit-stable across
    engines."""
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
        "p_size",
    )
    per_x = pts.groupBy("p_brand", "cents").agg(
        F.max("p_size").alias("max_size")
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.desc("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_x.withColumn(
            "best_above", F.coalesce(F.max("max_size").over(w), F.lit(-1))
        )
        .filter(F.col("max_size") > F.col("best_above"))
        .select(
            "p_brand",
            F.round(F.col("cents").cast("double") / 100, 2).alias("price"),
            F.col("max_size").alias("size"),
        )
        .orderBy("p_brand", F.desc(F.col("price")))
    )


@register(
    "win_kendall_tau_daily",
    tags=("mining", "correlation", "kendall", "robust"),
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY o_orderdate
),
pairs AS (
  SELECT CASE WHEN (a.n_orders < b.n_orders AND a.rev_cents < b.rev_cents)
               OR (a.n_orders > b.n_orders AND a.rev_cents > b.rev_cents)
              THEN 1 ELSE 0 END AS conc,
         CASE WHEN (a.n_orders < b.n_orders AND a.rev_cents > b.rev_cents)
               OR (a.n_orders > b.n_orders AND a.rev_cents < b.rev_cents)
              THEN 1 ELSE 0 END AS disc,
         CASE WHEN a.n_orders = b.n_orders AND a.rev_cents != b.rev_cents
              THEN 1 ELSE 0 END AS tie_x,
         CASE WHEN a.rev_cents = b.rev_cents AND a.n_orders != b.n_orders
              THEN 1 ELSE 0 END AS tie_y
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT (SELECT COUNT(*) FROM daily) AS n_days,
       COUNT(*) AS n_pairs,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       CAST(SUM(tie_x) AS BIGINT) AS ties_x,
       CAST(SUM(tie_y) AS BIGINT) AS ties_y,
       ROUND((SUM(conc) - SUM(disc))::DOUBLE
             / SQRT((SUM(conc) + SUM(disc) + SUM(tie_x))::DOUBLE
                    * (SUM(conc) + SUM(disc) + SUM(tie_y))::DOUBLE), 6)
         AS tau_b
FROM pairs
""",
)
def win_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL's τ-b between daily order count and daily revenue —
    the robust rank correlation next to the Pearson matrix
    (``operators/stock_stats.py``): do busier days bring more money,
    judged by rank agreement with full tie correction.

    Scale shape: orders collapse once to the CALENDAR-bounded daily
    table (revenue as exact integer cents); pair classification is a
    within-bounded-table self-join (span² pairs — calendar arithmetic,
    never raw orders) of pure integer predicates; τ-b is one double
    expression over the BIGINT totals.  Bit-stable across engines."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    a = daily.select(
        F.col("d").alias("d1"),
        F.col("n_orders").alias("x1"),
        F.col("rev_cents").alias("y1"),
    )
    b = daily.select(
        F.col("d").alias("d2"),
        F.col("n_orders").alias("x2"),
        F.col("rev_cents").alias("y2"),
    )
    pairs = a.join(b, F.col("d1") < F.col("d2")).select(
        F.when(
            ((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
            | ((F.col("x1") > F.col("x2")) & (F.col("y1") > F.col("y2"))),
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            ((F.col("x1") < F.col("x2")) & (F.col("y1") > F.col("y2")))
            | ((F.col("x1") > F.col("x2")) & (F.col("y1") < F.col("y2"))),
            1,
        )
        .otherwise(0)
        .alias("disc"),
        F.when(
            (F.col("x1") == F.col("x2")) & (F.col("y1") != F.col("y2")), 1
        )
        .otherwise(0)
        .alias("tie_x"),
        F.when(
            (F.col("y1") == F.col("y2")) & (F.col("x1") != F.col("x2")), 1
        )
        .otherwise(0)
        .alias("tie_y"),
    )
    n_days = daily.agg(F.count(F.lit(1)).alias("n_days"))
    s_conc = F.sum("conc")
    s_disc = F.sum("disc")
    s_tx = F.sum("tie_x")
    s_ty = F.sum("tie_y")
    return (
        pairs.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            s_conc.cast("long").alias("concordant"),
            s_disc.cast("long").alias("discordant"),
            s_tx.cast("long").alias("ties_x"),
            s_ty.cast("long").alias("ties_y"),
            F.round(
                (s_conc - s_disc).cast("double")
                / F.sqrt(
                    (s_conc + s_disc + s_tx).cast("double")
                    * (s_conc + s_disc + s_ty).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_x",
            "ties_y",
            "tau_b",
        )
    )
