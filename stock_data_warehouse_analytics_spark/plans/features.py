"""Feature-store materialization: the wide per-entity feature table a
model-training pipeline snapshots, assembled from the engine's window/
agg primitives in one pass hierarchy — plus the interarrival-burstiness
stats that feed it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# Exact std for INTEGER-valued columns of large magnitude (gap_us up to
# ~1e11): the double gap^2 (~1e20, ulp ~1e4) cannot round to decimal
# deterministically cross-engine — so square inside integer decimal
# arithmetic (exact), string-route the >17-digit sum to double
# (warehouse_ops2._dsq_sum rationale at scale 0).
def _int_sq_sum(col: str):
    xd = F.col(col).cast("decimal(18,0)")
    return F.sum((xd * xd).cast("decimal(38,0)")).cast("string").cast("double")


def _sql_int_sq_sum(x: str) -> str:
    # DECIMAL(19,0) operands force int128 multiplication in DuckDB
    return (
        f"CAST(CAST(SUM(CAST(CAST({x} AS DECIMAL(19,0)) * CAST({x} AS DECIMAL(19,0))"
        f" AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE)"
    )


def _int_std(col: str):
    s_ = dsum(col)
    m2 = _int_sq_sum(col)
    n = F.count(F.col(col))
    return F.sqrt((m2 - s_ * s_ / n) / (n - F.lit(1)))


def _sql_int_std(x: str) -> str:
    s_ = sql_dsum(x)
    m2 = _sql_int_sq_sum(x)
    n = f"COUNT({x})"
    return f"SQRT((({m2}) - ({s_}) * ({s_}) / ({n})) / (({n}) - 1))"


@register(
    "events_interarrival_stats",
    tags=("behavioral", "time-series", "burstiness"),
    oracle=f"""
WITH gaps AS (
  SELECT event_type,
         CAST(date_diff('microsecond',
              LAG(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id),
              ts) AS DOUBLE) AS gap_us
  FROM events
)
SELECT event_type,
       COUNT(gap_us) AS n_gaps,
       {sql_davg('gap_us')} AS mean_gap_us,
       {_sql_int_std('gap_us')} AS std_gap_us,
       {_sql_int_std('gap_us')} / {sql_davg('gap_us')} AS cv
FROM gaps
GROUP BY event_type
ORDER BY event_type
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-gap statistics per event type: mean/std of the gap
    and the coefficient of variation — the burstiness measure (CV ≈ 1:
    Poisson; CV >> 1: bursty; CV << 1: metronomic) that decides whether
    rate alerts need the burst detector or a simple threshold.  One
    window (lag) + one grouped agg over the same event_type
    partitioning — a single shuffle; gaps stay in integer microseconds
    so every intermediate is exactly representable cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    # gaps stay in integer microseconds (exactly representable as
    # double and decimal on both engines); seconds would divide by 1e6
    # and land on decimal-grid values where engine rounding can split
    gap = (
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).cast("double")
    ).alias("gap_us")
    gaps = e.select("event_type", gap)
    mean, std = davg("gap_us"), _int_std("gap_us")
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            mean.alias("mean_gap_us"),
            std.alias("std_gap_us"),
            (std / mean).alias("cv"),
        )
        .orderBy("event_type")
    )


_FEAT_WINDOW_DAYS = 14


@register(
    "mining_churn_features",
    tags=("mining", "features", "feature-store"),
    oracle=f"""
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
base AS (
  SELECT e.user_id, e.ts, e.event_type, e.value,
         date_diff('day', e.ts, mx.max_ts) AS age_days
  FROM events e CROSS JOIN mx
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(MIN(age_days) AS BIGINT) AS days_since_last,
       CAST(MAX(age_days) AS BIGINT) AS tenure_days,
       CAST(SUM(CASE WHEN age_days < {_FEAT_WINDOW_DAYS} THEN 1 ELSE 0 END) AS BIGINT)
         AS recent_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
         AS total_spend,
       COUNT(DISTINCT event_type) AS n_distinct_types,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days
FROM base
GROUP BY user_id
ORDER BY user_id
""",
)
def mining_churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-model feature snapshot: the wide per-user table a training
    pipeline materializes — recency, tenure, {_FEAT_WINDOW_DAYS}-day
    activity, purchase/error counts, spend, breadth, active days — all
    as conditional aggregates inside ONE grouped pass over the event
    log (adding a feature costs an expression, not a scan; the
    dq_consistency_rules stance applied to feature engineering).  The
    corpus watermark broadcasts as one row; distinct counts expand to
    the standard two-phase plan."""
    e = load_table(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("max_ts"))
    base = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "ts",
        "event_type",
        "value",
        F.datediff(F.col("max_ts"), F.col("ts")).alias("age_days"),
    )
    return (
        base.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("age_days").cast("long").alias("days_since_last"),
            F.max("age_days").cast("long").alias("tenure_days"),
            F.sum(
                F.when(F.col("age_days") < _FEAT_WINDOW_DAYS, 1).otherwise(0)
            ).alias("recent_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0
                )
            ).alias("total_spend"),
            F.countDistinct("event_type").alias("n_distinct_types"),
            F.countDistinct(F.col("ts").cast("date")).alias("n_active_days"),
        )
        .orderBy("user_id")
    )
