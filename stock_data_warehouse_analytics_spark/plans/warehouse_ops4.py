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
    makes visible).  Rows-only: the sketch is engine-specific by
    nature; the bound is pinned in pytest instead."""
    from ..operators.ranking import grouped_exact_quantiles

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .localCheckpoint(eager=True)  # feeds exact passes + approx agg
    )
    exact = grouped_exact_quantiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        [("p50_exact", 0.5), ("p95_exact", 0.95)],
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
