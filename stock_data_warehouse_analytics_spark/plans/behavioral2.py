"""Behavioral batch 2: session-level conversion and windowed top-k —
the rollups that sit on top of sessionization and tumbling windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_GAP_US = 6 * 3600 * 1_000_000
_SESSION_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"


@register(
    "behavior_session_conversion",
    tags=("behavioral", "session", "conversion", "funnel"),
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER ({_SESSION_ORDER}) IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER ({_SESSION_ORDER})) > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT *, CAST(SUM(is_new) OVER ({_SESSION_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
),
per_session AS (
  SELECT user_id, session_seq,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
         COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_seq
)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(has_view) AS BIGINT) AS n_view_sessions,
       CAST(SUM(CASE WHEN has_view = 1 AND has_purchase = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted,
       CAST(SUM(CASE WHEN has_view = 1 AND has_purchase = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(has_view) AS DOUBLE) AS view_to_purchase_rate,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM per_session
""",
)
def behavior_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion rate: sessions are the 6-h
    gaps-and-islands (same spec as sessionize_events), each session
    reduced to has-view / has-purchase flags, then the
    view→purchase rate — the funnel metric computed at the visit grain
    rather than the user grain (funnel_view_click_purchase).  All three
    layers (lag flag, running session id, per-session rollup) share the
    user partitioning: one shuffle plus the bounded final row."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(prev_us.isNull() | ((ts_us - prev_us) > _GAP_US), 1).otherwise(0)
    sess = e.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "has_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchase"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    converted = F.sum(
        F.when((F.col("has_view") == 1) & (F.col("has_purchase") == 1), 1).otherwise(
            0
        )
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_view").alias("n_view_sessions"),
        converted.alias("n_converted"),
        (converted.cast("double") / F.sum("has_view").cast("double")).alias(
            "view_to_purchase_rate"
        ),
        F.sum("n_events").alias("n_events"),
    )


_US_30M = 30 * 60 * 1_000_000


@register(
    "stream_tumbling_topk",
    tags=("streaming", "window", "topk", "rank"),
    oracle=f"""
WITH counts AS (
  SELECT make_timestamp((epoch_us(ts) // {_US_30M}) * {_US_30M}) AS window_start,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n DESC, event_type) AS rk
  FROM counts
)
SELECT window_start, event_type, n, rk
FROM ranked WHERE rk <= 3
ORDER BY window_start, rk
""",
)
def stream_tumbling_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 30-minute tumbling window — the windowed
    leaderboard every live dashboard shows.  Batch-equivalent streaming
    form: windowed counts (partial+final agg), then a rank window
    PARTITIONED BY WINDOW — each window ranks independently, so the
    sort is per-window-sized, never global.  In a live stream the rank
    runs on the complete-mode sink or per micro-batch via foreachBatch;
    the deterministic tiebreak (count desc, type asc) makes the k-th
    place stable cross-engine."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(F.window("ts", "30 minutes"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("window").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "rk",
        )
        .orderBy("window_start", "rk")
    )


_HOURS = list(range(24))


@register(
    "olap_activity_heatmap",
    tags=("behavioral", "olap", "pivot", "heatmap"),
    oracle="""
SELECT dayofweek(ts) AS dow,
       {cols}
FROM events
GROUP BY dow
ORDER BY dow
""".format(
        cols=",\n       ".join(
            f"CAST(SUM(CASE WHEN hour(ts) = {h} THEN 1 ELSE 0 END) AS BIGINT) AS h{h:02d}"
            for h in _HOURS
        )
    ),
)
def olap_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap — the wide pivot every usage
    dashboard opens with (seasonal indices give the model; this gives
    the picture).  A 7×24 integer matrix from ONE grouped pass with 24
    conditional sums — same plan family as the explicit-values pivot
    (A1-A3) but with fully static columns, so the aggregate needs no
    pivot-value discovery pass.  Spark's 1-based dayofweek shifts to
    DuckDB's 0-based convention."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy((F.dayofweek("ts") - 1).alias("dow"))
        .agg(
            *[
                F.sum(F.when(F.hour("ts") == h, 1).otherwise(0)).alias(f"h{h:02d}")
                for h in _HOURS
            ]
        )
        .orderBy("dow")
    )
