"""Warehouse-ops batch 4: point-in-time dimension join and drawdown
duration — the temporal-join and risk-duration pieces that complete the
SCD-2 and drawdown families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import dsum_w, sql_dsum_w
from .joins_advanced import asof_join
from .registry import register

_W_CUM = ("(PARTITION BY user_id ORDER BY ts, event_id "
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")


@register(
    "join_point_in_time_state",
    tags=("warehouse", "join", "asof", "scd2", "temporal"),
    oracle="""
WITH st AS (
  SELECT user_id, ts, arg_max(event_type, event_id) AS state
  FROM events GROUP BY user_id, ts
),
changes AS (
  SELECT user_id, ts, state FROM (
    SELECT user_id, ts, state,
           LAG(state) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM st
  ) WHERE prev IS NULL OR state <> prev
),
versioned AS (
  SELECT user_id, state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
  FROM changes
),
purchases AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.value, v.state AS state_at_purchase
FROM purchases p
LEFT JOIN versioned v
  ON v.user_id = p.user_id
 AND v.valid_from <= p.ts
 AND (v.valid_to IS NULL OR p.ts < v.valid_to)
ORDER BY p.user_id, p.event_id
""",
)
def join_point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase gets the SCD-2
    state that was valid AT its timestamp.  Because the versioned
    intervals PARTITION each user's timeline, 'state whose
    [valid_from, valid_to) contains ts' equals 'latest change with
    valid_from ≤ ts' — so the plan is the single-shuffle backward as-of
    sweep, not an interval join (the oracle runs the literal interval
    predicate to prove the equivalence).  States dedup to one per
    (user, ts) via arg_max on the event tiebreak first — the as-of
    build-uniqueness precondition."""
    e = load_table(spark, sf_dir, "events")
    st = e.groupBy("user_id", "ts").agg(
        F.max_by("event_type", "event_id").alias("state")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    changes = (
        st.withColumn("prev", F.lag("state").over(w))
        .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
        .select("user_id", "ts", F.col("state").alias("state_at_purchase"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return (
        asof_join(
            purchases,
            changes,
            on="user_id",
            value_col="state_at_purchase",
            direction="backward",
        )
        .select("event_id", "user_id", "value", "state_at_purchase")
        .orderBy("user_id", "event_id")
    )


@register(
    "win_drawdown_duration",
    tags=("window", "drawdown", "gaps-islands"),
    oracle=f"""
WITH r AS (
  SELECT user_id, ts, event_id,
         (value / LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) AS ret
  FROM events
),
cum AS (
  SELECT user_id, ts, event_id,
         EXP({sql_dsum_w('LN(1 + ret)', _W_CUM)}) AS cum_ret
  FROM r WHERE ret IS NOT NULL AND ret > -1
),
flagged AS (
  SELECT user_id, ts, event_id, cum_ret,
         CASE WHEN cum_ret < MAX(cum_ret) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) THEN 1 ELSE 0 END AS under,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM cum
),
islands AS (
  SELECT user_id, ts,
         rn - ROW_NUMBER() OVER (PARTITION BY user_id, under ORDER BY ts, event_id)
           AS island
  FROM flagged WHERE under = 1
),
runs AS (
  SELECT user_id, island, COUNT(*) AS n_rows,
         MIN(ts) AS start_ts, MAX(ts) AS end_ts
  FROM islands GROUP BY user_id, island
),
best AS (
  SELECT user_id, n_rows, start_ts, end_ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n_rows DESC, start_ts) AS rk
  FROM runs
)
SELECT user_id, n_rows AS max_underwater_rows, start_ts, end_ts,
       date_diff('microsecond', start_ts, end_ts) AS span_us
FROM best WHERE rk = 1
ORDER BY user_id
""",
)
def win_drawdown_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest underwater period per series — the duration companion to
    max drawdown (datavisualization.py:607-610 gives depth; recovery
    TIME is what risk reports quote): rows below the running peak form
    gaps-and-islands, the longest island wins (ties to the earliest).
    Four stacked windows — returns, cumulative product, running max,
    island numbering — all over the same user partitioning, so Catalyst
    reuses ONE exchange; the island rollup is the only extra shuffle."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum_frame = w.rowsBetween(Window.unboundedPreceding, 0)
    r = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value") / F.lag("value", 1).over(w) - 1).alias("ret"),
    ).filter(F.col("ret").isNotNull() & (F.col("ret") > -1))
    cum = r.select(
        "user_id",
        "ts",
        "event_id",
        F.exp(dsum_w(F.log1p("ret"), cum_frame)).alias("cum_ret"),
    )
    flagged = cum.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("cum_ret") < F.max("cum_ret").over(cum_frame), 1
        ).otherwise(0).alias("under"),
        F.row_number().over(w).alias("rn"),
    )
    w_under = Window.partitionBy("user_id", "under").orderBy("ts", "event_id")
    islands = flagged.filter(F.col("under") == 1).select(
        "user_id",
        "ts",
        (F.col("rn") - F.row_number().over(w_under)).alias("island"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
    w_best = Window.partitionBy("user_id").orderBy(F.desc("n_rows"), "start_ts")
    span = F.unix_micros(F.col("end_ts").cast("timestamp")) - F.unix_micros(
        F.col("start_ts").cast("timestamp")
    )
    return (
        runs.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("n_rows").alias("max_underwater_rows"),
            "start_ts",
            "end_ts",
            span.alias("span_us"),
        )
        .orderBy("user_id")
    )


@register(
    "dq_approx_vs_exact_quantiles",
    tags=("warehouse", "dq", "percentile", "sketch", "audit"),
    oracle=None,  # approx_percentile's KLL-style sketch is
    # engine-specific; the accuracy bound itself is asserted in
    # tests/test_fast_aggregates.py::test_approx_quantile_audit_bounds
)
def dq_approx_vs_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-accuracy AUDIT a team runs before trusting
    ``approx_percentile`` at 100 TB: per return flag, the approximate
    p50/p95 (accuracy 1000) against the exact bounded-memory quantiles
    (``operators/ranking.grouped_exact_quantiles``), with absolute and
    RANK error.  Rank error is the meaningful metric — the KLL-style
    sketch guarantees rank ε, not value ε, so a fat-tailed column can
    show large value gaps at tiny rank error (exactly what this report
    makes visible).  Exact side reads the session-staged quantile
    panel (plans/quantile_store.py); with the exact passes staged, the
    2-column projection feeds only two passes (approx agg + rank
    audit) — columnar rescans with pushdown, no checkpoint (the
    winsorized-stats measurement).  Rows-only: the sketch is
    engine-specific by nature; the bound is pinned in pytest
    instead."""
    from .quantile_store import quantile_panel

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    exact = quantile_panel(
        spark, sf_dir, "lineitem", "l_returnflag", "l_extendedprice"
    ).select(
        "l_returnflag",
        F.col("q50").alias("p50_exact"),
        F.col("q95").alias("p95_exact"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            F.col("l_extendedprice").cast("double"),
            F.array(F.lit(0.5), F.lit(0.95)),
            1000,
        ).alias("ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # rank of the approx value = fraction of rows below it — one extra
    # conditional-count pass via a broadcast join of the 3-row report
    ap = approx.select(
        "l_returnflag",
        "n_rows",
        F.col("ap")[0].alias("p50_approx"),
        F.col("ap")[1].alias("p95_approx"),
    )
    joined = li.join(F.broadcast(ap), "l_returnflag")
    ranks = joined.groupBy("l_returnflag").agg(
        (
            F.count(F.when(F.col("l_extendedprice") <= F.col("p50_approx"), 1))
            / F.count(F.lit(1))
        ).alias("p50_approx_rank"),
        (
            F.count(F.when(F.col("l_extendedprice") <= F.col("p95_approx"), 1))
            / F.count(F.lit(1))
        ).alias("p95_approx_rank"),
    )
    return (
        exact.join(ap, "l_returnflag")
        .join(ranks, "l_returnflag")
        .select(
            "l_returnflag",
            "n_rows",
            F.round("p50_exact", 6).alias("p50_exact"),
            F.round("p50_approx", 6).alias("p50_approx"),
            F.round(F.abs(F.col("p50_approx_rank") - 0.5), 6).alias(
                "p50_rank_err"
            ),
            F.round("p95_exact", 6).alias("p95_exact"),
            F.round("p95_approx", 6).alias("p95_approx"),
            F.round(F.abs(F.col("p95_approx_rank") - 0.95), 6).alias(
                "p95_rank_err"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------- incremental view maintenance

_IVM_CUT = "1997-01-01"  # base = orders before, delta = the new batch


@register(
    "warehouse_ivm_delta_join",
    tags=("warehouse", "ivm", "incremental", "materialized-view", "join"),
    oracle=f"""
WITH enr AS (
  SELECT n.n_name AS nation,
         strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         o.o_orderdate < DATE '{_IVM_CUT}' AS is_base
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
full_v AS (
  SELECT nation, month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM enr GROUP BY nation, month
),
base_v AS (
  SELECT nation, month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM enr WHERE is_base GROUP BY nation, month
),
delta_v AS (
  SELECT nation, month,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents
  FROM enr WHERE NOT is_base GROUP BY nation, month
),
merged AS (
  SELECT COALESCE(b.nation, d.nation) AS nation,
         COALESCE(b.month, d.month) AS month,
         COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS n_orders,
         COALESCE(b.revenue_cents, 0) + COALESCE(d.revenue_cents, 0)
           AS revenue_cents
  FROM base_v b FULL OUTER JOIN delta_v d
    ON b.nation = d.nation AND b.month = d.month
)
SELECT f.nation, f.month, f.n_orders, f.revenue_cents,
       m.n_orders AS n_orders_ivm,
       m.revenue_cents AS revenue_cents_ivm,
       f.n_orders = m.n_orders
         AND f.revenue_cents = m.revenue_cents AS ivm_consistent
FROM full_v f JOIN merged m
  ON m.nation = f.nation AND m.month = f.month
ORDER BY f.nation, f.month
""",
)
def warehouse_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE over a join view — the
    delta-propagation identity every warehouse's MV refresh relies on:
    for the materialized view V = π_{{nation, month}} γ_{{count, sum}}
    (orders ⋈ customer ⋈ nation), a new order batch Δ (orders on/after
    {cut}) refreshes V WITHOUT rescanning the base fact because
    count/sum are additive: V(base ∪ Δ) = V(base) ⊕ V(Δ), where ⊕ is a
    full-outer merge with coalesced addition.  The query materializes
    BOTH paths — the full recompute and the base-view-plus-delta
    merge — and emits the per-group consistency flag, i.e. the IVM
    correctness certificate itself (every `ivm_consistent` must be
    true; the driver's hash compare pins it cross-engine).

    Exactness: revenue in integer cents throughout; the merge is
    COALESCE + BIGINT addition; the flag compares exact integers.

    Scale shape: ONE enriched scan feeds all three views (the join
    runs once; base/delta are partial-agg filters over it — at
    refresh time only Δ is scanned, the point of IVM); the merge is a
    full-outer join at (nation, month) grain — dimension-bounded, not
    fact-sized; nation (25 rows, fixed) broadcasts, while the
    orders⋈customer join is left UNHINTED — customer grows with scale
    factor, so the planner (AQE) must pick shuffle vs broadcast from
    actual sizes rather than a hint that force-ships a 100 TB-scale
    dimension to every executor."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    enr = (
        o.join(
            c.select("c_custkey", "c_nationkey"),
            o["o_custkey"] == c["c_custkey"],
        )
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
            (F.col("o_orderdate") < F.lit(_IVM_CUT).cast("date")).alias(
                "is_base"
            ),
        )
        # three consumers (full/base/delta) — stage the enriched scan
        # once; at refresh time a real pipeline reads only the delta
        .localCheckpoint(eager=True)
    )

    def view(df: DataFrame) -> DataFrame:
        return df.groupBy("nation", "month").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )

    full_v = view(enr)
    base_v = view(enr.filter(F.col("is_base")))
    delta_v = view(enr.filter(~F.col("is_base")))
    b = base_v.select(
        "nation",
        "month",
        F.col("n_orders").alias("bn"),
        F.col("revenue_cents").alias("br"),
    )
    d = delta_v.select(
        "nation",
        "month",
        F.col("n_orders").alias("dn"),
        F.col("revenue_cents").alias("dr"),
    )
    merged = b.join(d, ["nation", "month"], "full_outer").select(
        "nation",
        "month",
        (F.coalesce(F.col("bn"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0)))
        .alias("n_orders_ivm"),
        (F.coalesce(F.col("br"), F.lit(0)) + F.coalesce(F.col("dr"), F.lit(0)))
        .alias("revenue_cents_ivm"),
    )
    return (
        full_v.join(merged, ["nation", "month"])
        .select(
            "nation",
            "month",
            "n_orders",
            "revenue_cents",
            "n_orders_ivm",
            "revenue_cents_ivm",
            (
                (F.col("n_orders") == F.col("n_orders_ivm"))
                & (F.col("revenue_cents") == F.col("revenue_cents_ivm"))
            ).alias("ivm_consistent"),
        )
        .orderBy("nation", "month")
    )


warehouse_ivm_delta_join.__doc__ = warehouse_ivm_delta_join.__doc__.format(
    cut=_IVM_CUT
)


# ---------------------------------------------- write-audit-publish gate


@register(
    "warehouse_wap_gate",
    tags=("warehouse", "wap", "governance", "dq", "gate"),
    oracle="""
WITH maxm AS (
  SELECT date_trunc('month', MAX(o_orderdate)) AS m FROM orders
),
staged AS (
  SELECT * FROM orders
  WHERE date_trunc('month', o_orderdate) = (SELECT m FROM maxm)
),
prior AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_prior,
         CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
           AS n_months
  FROM orders
  WHERE date_trunc('month', o_orderdate) < (SELECT m FROM maxm)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL
                                  OR o_custkey IS NULL) AS BIGINT)
           AS null_keys,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS dup_keys,
         CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
           AS bad_price
  FROM staged
),
refv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphans
  FROM staged st LEFT JOIN customer c ON c.c_custkey = st.o_custkey
  WHERE c.c_custkey IS NULL
),
rules AS (
  SELECT 1 AS rule_order, 'key_not_null' AS rule, s.n AS n_checked,
         s.null_keys AS n_violations FROM s
  UNION ALL
  SELECT 2, 'unique_order_key', s.n, s.dup_keys FROM s
  UNION ALL
  SELECT 3, 'ref_customer_exists', s.n, r.orphans FROM s, refv r
  UNION ALL
  SELECT 4, 'price_positive', s.n, s.bad_price FROM s
  UNION ALL
  SELECT 5, 'volume_in_band', CAST(1 AS BIGINT),
         CASE WHEN 2 * s.n * p.n_months >= p.n_prior
                AND s.n * p.n_months <= 2 * p.n_prior
              THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END
  FROM s, prior p
)
SELECT rule_order, rule, n_checked, n_violations,
       n_violations = 0 AS passed
FROM rules ORDER BY rule_order
""",
)
def warehouse_wap_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH gate — the governance step between landing
    a batch and exposing it to readers (the Iceberg/Netflix WAP
    pattern): the STAGED batch (the newest calendar month of orders)
    is audited against five publish rules — key nullity, order-key
    uniqueness, referential integrity to customer, price domain, and a
    VOLUME band (staged row count within [½×, 2×] the prior monthly
    average — the dead-mans-switch against half-loaded or duplicated
    batches) — and each rule emits its violation count + verdict; the
    batch publishes only if every row reads passed = true.

    Exactness: every rule is an integer count; the volume band is the
    integer cross-multiplication 2·n·months ≥ prior ∧ n·months ≤
    2·prior (no double ratios anywhere).

    Scale shape: the staged filter is partition pruning in a real
    deployment (month = the landing partition); the audit is one pass
    over the staged batch (conditional sums in one aggregate) plus one
    left-anti-shaped referential join against the customer dimension;
    the prior-volume baseline is a one-row aggregate over partition
    metadata-sized input.  Rules unpivot from one counted row —
    adding a rule costs an expression, not a scan (the
    ``dq_consistency_rules`` stance, applied at BATCH scope)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    maxm = o.agg(
        F.trunc(F.max("o_orderdate"), "month").alias("m")
    )
    om = o.crossJoin(F.broadcast(maxm)).withColumn(
        "_m", F.trunc(F.col("o_orderdate"), "month")
    )
    staged = om.filter(F.col("_m") == F.col("m"))
    prior = (
        om.filter(F.col("_m") < F.col("m"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prior"),
            F.countDistinct("_m").cast("long").alias("n_months"),
        )
    )
    s = staged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(
            F.when(
                F.col("o_orderkey").isNull() | F.col("o_custkey").isNull(),
                1,
            )
        )
        .cast("long")
        .alias("null_keys"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("dup_keys"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
        .cast("long")
        .alias("bad_price"),
    )
    refv = (
        staged.join(c, staged["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphans"))
    )
    base = s.crossJoin(F.broadcast(refv)).crossJoin(F.broadcast(prior))
    vol_viol = F.when(
        (2 * F.col("n") * F.col("n_months") >= F.col("n_prior"))
        & (F.col("n") * F.col("n_months") <= 2 * F.col("n_prior")),
        F.lit(0),
    ).otherwise(F.lit(1))
    rules = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("rule_order"),
                    F.lit("key_not_null").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("null_keys").alias("n_violations"),
                ),
                F.struct(
                    F.lit(2).alias("rule_order"),
                    F.lit("unique_order_key").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("dup_keys").alias("n_violations"),
                ),
                F.struct(
                    F.lit(3).alias("rule_order"),
                    F.lit("ref_customer_exists").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("orphans").alias("n_violations"),
                ),
                F.struct(
                    F.lit(4).alias("rule_order"),
                    F.lit("price_positive").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("bad_price").alias("n_violations"),
                ),
                F.struct(
                    F.lit(5).alias("rule_order"),
                    F.lit("volume_in_band").alias("rule"),
                    F.lit(1).cast("long").alias("n_checked"),
                    vol_viol.cast("long").alias("n_violations"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return rules.withColumn(
        "passed", F.col("n_violations") == 0
    ).orderBy("rule_order")
