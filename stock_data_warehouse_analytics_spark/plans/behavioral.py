"""Behavioral / product-analytics queries over ``events``: batch
sessionization (gaps-and-islands), funnel conversion, cohort retention.

These are the warehouse staples every event pipeline ships alongside
the OLAP rollups — all three are single-scan plans whose shuffles key
on ``user_id`` (or its aggregates), so they scale like any grouped
aggregation: shuffle volume ∝ users/sessions, not events.

Reference parity: the reference's per-ticker time-series treatment
(groupby-apply over ordered rows, `datamining.py`) is the same
partition-ordered pattern; sessionization is its event-domain analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import dsum, sql_dsum
from .registry import register

# 6-hour inactivity gap: events average ~11 h apart per user in the
# testdata, so this yields a real mix of single- and multi-event
# sessions (any gap value is semantically valid; this one exercises
# both branches).
_GAP_US = 6 * 3600 * 1_000_000

_SESSION_ORDER = "PARTITION BY user_id ORDER BY ts, event_id"


@register(
    "sessionize_events",
    tags=("behavioral", "window", "gaps-and-islands"),
    oracle=f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER ({_SESSION_ORDER}) IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER ({_SESSION_ORDER})) > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sess AS (
  SELECT *, SUM(is_new) OVER ({_SESSION_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(ts) AS start_ts,
       MAX(ts) AS end_ts,
       ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6) AS duration_secs,
       {sql_dsum('value')} AS total_value
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands: flag a session start
    where the per-user gap exceeds 6 h (lag window), running-sum the
    flags into session ids, aggregate per session.  Both windows and
    the final aggregate share the ``user_id`` hash partitioning — one
    shuffle total.  The streaming analog is
    ``streaming/event_windows.py``'s native session window."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > _GAP_US), 1
    ).otherwise(0)
    sess = e.withColumn(
        "session_seq",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    dur_us = F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(
        F.min("ts").cast("timestamp")
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.round(dur_us / 1_000_000.0, 6).alias("duration_secs"),
            dsum("value").alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "funnel_view_click_purchase",
    tags=("behavioral", "funnel", "conditional-agg"),
    oracle="""
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END)     AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END)    AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS n_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_then_click,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
         AS n_full_funnel
FROM firsts
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel: per user, first occurrence of each stage
    (conditional MIN — one grouped agg over one scan), then ordered-
    stage counts.  No joins, no self-unions: the classic N-stage funnel
    is N conditional aggregates wide, which is why it still runs in one
    pass at 100 TB."""
    e = load_table(spark, sf_dir, "events")

    def first_ts(etype: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(clicked, 1)).alias("n_view_then_click"),
        F.count(F.when(purchased, 1)).alias("n_full_funnel"),
    )


@register(
    "retention_cohorts",
    tags=("behavioral", "cohort", "retention"),
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       date_diff('day', cohort_day, day)::BIGINT AS day_offset,
       COUNT(*) AS n_users
FROM activity JOIN first_day USING (user_id)
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day,
    counted on each subsequent active day.  The user⋈cohort join keys
    on user_id — same partitioning as both aggregates feeding it, so
    AQE plans it shuffle-reuse; cohort table is users-sized (broadcast
    at real scale)."""
    e = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    first_day = e.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = e.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(first_day, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )
