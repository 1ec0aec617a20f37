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


# ---------------------------------------------------- VaR / CVaR

_VAR_NUM = 19  # one-sided 95%: rank = ceil(0.95 n) = (19n + 19) // 20


@register(
    "olap_var_cvar",
    tags=("olap", "risk", "percentile", "tail"),
    oracle=f"""
WITH sc AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM sc
),
var AS (
  SELECT event_type, n, cents AS var_cents
  FROM ranked WHERE rn = ({_VAR_NUM} * n + {_VAR_NUM}) // 20
),
tail AS (
  SELECT r.event_type,
         CAST(COUNT(*) AS BIGINT) AS n_tail,
         CAST(SUM(r.cents) AS BIGINT) AS tail_cents
  FROM ranked r JOIN var v ON v.event_type = r.event_type
  WHERE r.rn >= ({_VAR_NUM} * r.n + {_VAR_NUM}) // 20
  GROUP BY r.event_type
)
SELECT v.event_type, CAST(v.n AS BIGINT) AS n,
       ROUND(v.var_cents / 100.0, 6) AS var95,
       t.n_tail,
       ROUND(CAST(t.tail_cents AS DOUBLE) / (t.n_tail * 100.0), 6)
         AS cvar95
FROM var v JOIN tail t ON t.event_type = v.event_type
ORDER BY v.event_type
""",
)
def olap_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical VaR / CVaR (expected shortfall) per event type — the
    tail-risk pair next to the percentile family: VaR₉₅ is the exact
    ceil(0.95·n)-th smallest per-event value (integer rank
    (19n+19)//20, no interpolation — the historical-simulation
    convention), CVaR₉₅ the mean of the tail AT OR ABOVE it (the
    coherent risk measure Basel moved to, because VaR alone says
    nothing about how bad the tail is).

    Exactness: values in integer cents, ranks and tail sums exact
    BIGINT; the only doubles are the two final /100 conversions
    (round-6).

    Scale shape: one per-type window rank (partitioned by the group
    key — no global sort); the tail aggregation joins the |types|-row
    VaR table back at group grain.  At 100 TB the exact-rank window is
    the deliberate choice over approx_percentile because risk numbers
    get audited (``dq_approx_vs_exact_quantiles`` measures exactly
    that trade)."""
    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = sc.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # BIGINT div, not double-floor: (19n+19) exceeds 2^53 long before
    # n exceeds BIGINT, and the rank must stay exact at any n
    rank_at = F.expr(f"({_VAR_NUM} * n + {_VAR_NUM}) div 20")
    var = ranked.filter(F.col("rn") == rank_at).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("cents").alias("var_cents"),
    )
    tail = (
        ranked.filter(F.col("rn") >= rank_at)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.sum("cents").cast("long").alias("tail_cents"),
        )
    )
    return (
        var.join(tail, "event_type")
        .select(
            "event_type",
            "n",
            F.round(F.col("var_cents") / 100.0, 6).alias("var95"),
            "n_tail",
            F.round(
                F.col("tail_cents").cast("double")
                / (F.col("n_tail") * 100.0),
                6,
            ).alias("cvar95"),
        )
        .orderBy("event_type")
    )
