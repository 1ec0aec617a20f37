"""Window-function plans (W1–W13 analogs, SURVEY.md §2.6) on events/orders.

The reference's window surface is per-ticker pandas transforms; here the
same semantics run per ``user_id`` over the events table (150 users at
sf0.01 → thousands of partitions at scale; one shuffle per partitioning,
every expression JVM-side).  Deterministic total order everywhere:
``(ts, event_id)`` — event_id is the unique tiebreak (SURVEY.md §4.2
item 7).

Oracle exactness: windowed sums/moments go through the decimal trick
(``plans/exact.py``) because DuckDB's segment-tree sliding aggregation
adds in a different order than Spark's frame iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.windows import (
    drawdown,
    lag_pct_change,
    lead_,
    ordered_window,
    running_max,
    temporal_split,
)
from ..sources.tables import load_table
from .exact import (
    davg,
    davg_w,
    dcorr_w,
    dstddev_samp_w,
    dsum,
    dsum_w,
    sql_davg,
    sql_davg_w,
    sql_dcorr_w,
    sql_dstddev_samp_w,
    sql_dsum,
    sql_dsum_w,
)
from .registry import register

# Canonical deterministic per-user ordering, Spark + SQL spellings.
_W = "(PARTITION BY user_id ORDER BY ts, event_id)"
_W_CUM = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
_W_ROLL20 = "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)"
_W_PART = "(PARTITION BY user_id)"


def _events_w():
    return ordered_window(["user_id"], ["ts", "event_id"])


@register(
    "win_lead_lag_pct",
    tags=("window", "lead", "lag"),
    oracle=f"""
SELECT
  event_id, user_id, value,
  LEAD(value, 1) OVER {_W} AS next_value,
  LAG(value, 1)  OVER {_W} AS prev_value,
  (value / LAG(value, 1) OVER {_W} - 1) AS pct_change
FROM events
ORDER BY user_id, ts, event_id
""",
)
def win_lead_lag_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2 — lead (next-day target, datamining_analysis.py:70) and
    lag-based pct_change (datamining_analysis.py:107) per user."""
    e = load_table(spark, sf_dir, "events")
    w = _events_w()
    return e.select(
        "event_id",
        "user_id",
        "value",
        lead_("value", w).alias("next_value"),
        F.lag("value", 1).over(w).alias("prev_value"),
        lag_pct_change("value", w).alias("pct_change"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "win_cumsum_runmax",
    tags=("window", "cumulative"),
    oracle=f"""
SELECT
  event_id, user_id,
  {sql_dsum_w('value', _W_CUM)} AS cum_value,
  MAX(value) OVER {_W_CUM} AS run_max,
  ROW_NUMBER() OVER {_W} AS rn,
  FIRST_VALUE(value) OVER {_W_CUM} AS first_val
FROM events
ORDER BY user_id, rn
""",
)
def win_cumsum_runmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3+W6 — running sum (datavisualization.py:277 cumsum) and running
    max (:608 cummax), plus row_number and first_value."""
    e = load_table(spark, sf_dir, "events")
    w = _events_w()
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return e.select(
        "event_id",
        "user_id",
        dsum_w("value", cum).alias("cum_value"),
        running_max("value", w).alias("run_max"),
        F.row_number().over(w).alias("rn"),
        F.first("value").over(cum).alias("first_val"),
    ).orderBy("user_id", "rn")


@register(
    "win_rolling_stats",
    tags=("window", "rolling"),
    oracle=f"""
SELECT
  event_id, user_id,
  CASE WHEN COUNT(value) OVER {_W_ROLL20} >= 20
       THEN {sql_davg_w('value', _W_ROLL20)} END AS ma20,
  CASE WHEN COUNT(value) OVER {_W_ROLL20} >= 20
       THEN {sql_dstddev_samp_w('value', _W_ROLL20)} END AS vol20
FROM events
ORDER BY user_id, ts, event_id
""",
)
def win_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8+W9 — 20-row rolling mean/std with pandas ``min_periods=window``
    semantics (null until a full window; datavisualization.py:411-417,
    640-644), via exact windowed moments."""
    e = load_table(spark, sf_dir, "events")
    w = _events_w()
    roll = w.rowsBetween(-19, 0)
    cnt = F.count("value").over(roll)
    return e.select(
        "event_id",
        "user_id",
        F.when(cnt >= 20, davg_w("value", roll)).alias("ma20"),
        F.when(cnt >= 20, dstddev_samp_w("value", roll)).alias("vol20"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "win_zscore_anomalies",
    tags=("window", "zscore", "filter"),
    oracle=f"""
WITH z AS (
  SELECT event_id, user_id, value,
    (value - {sql_davg_w('value', _W_PART)})
      / {sql_dstddev_samp_w('value', _W_PART)} AS z_score
  FROM events
)
SELECT event_id, user_id, value, z_score
FROM z WHERE ABS(z_score) > 2
ORDER BY user_id, event_id
""",
)
def win_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11+F5+M5 — whole-partition z-score then |z|>2 anomaly filter
    (datamining_analysis.py:123-131), via exact moments so the filter
    selects identical rows on both engines."""
    e = load_table(spark, sf_dir, "events")
    part = Window.partitionBy("user_id")
    z = (F.col("value") - davg_w("value", part)) / dstddev_samp_w("value", part)
    return (
        e.select("event_id", "user_id", "value", z.alias("z_score"))
        .filter(F.abs("z_score") > 2)
        .orderBy("user_id", "event_id")
    )


@register(
    "win_cumprod_drawdown",
    tags=("window", "cumprod", "drawdown"),
    oracle=f"""
WITH r AS (
  SELECT user_id, ts, event_id,
    (value / LAG(value, 1) OVER {_W} - 1) AS ret
  FROM events
), cum AS (
  SELECT user_id, ts, event_id,
    EXP({sql_dsum_w('LN(1 + ret)', _W_CUM)}) AS cum_ret
  FROM r WHERE ret IS NOT NULL AND ret > -1
), dd AS (
  SELECT user_id,
    (cum_ret - MAX(cum_ret) OVER {_W_CUM}) / MAX(cum_ret) OVER {_W_CUM} AS drawdown
  FROM cum
)
SELECT user_id, ROUND(MIN(drawdown), 6) AS max_drawdown
FROM dd GROUP BY user_id
ORDER BY user_id
""",
)
def win_cumprod_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5+W6+W7 — cumprod via exp∘sum∘log1p (no Spark builtin,
    SURVEY.md §4.2 item 2), running max, max drawdown per partition
    (datavisualization.py:607-610).

    The log1p terms pass through the decimal sum so 1-ulp libm
    differences between JVM and DuckDB can't accumulate; the final
    value is rounded to 6 (exp is not correctly-rounded in either
    engine)."""
    e = load_table(spark, sf_dir, "events")
    w = _events_w()
    # ret = −1 (a zero value after a non-zero) would put ln(0) in the
    # fold — excluded on both engines; ret < −1 can't occur (value ≥ 0).
    ret = e.select(
        "user_id", "ts", "event_id", lag_pct_change("value", w).alias("ret")
    ).filter(F.col("ret").isNotNull() & (F.col("ret") > -1))
    # operators.windows.cumulative_product is exp(plain double sum); here
    # the log1p terms go through the decimal sum to mirror the oracle
    # bit-for-bit (the operator itself is exercised by the stock pipeline).
    cum = ret.select(
        "user_id", "ts", "event_id",
        F.exp(
            dsum_w(F.log1p("ret"), w.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("cum_ret"),
    )
    dd = cum.select("user_id", drawdown(F.col("cum_ret"), w).alias("drawdown"))
    return (
        dd.groupBy("user_id")
        .agg(F.round(F.min("drawdown"), 6).alias("max_drawdown"))
        .orderBy("user_id")
    )


@register(
    "win_rank_topk_per_group",
    tags=("window", "rank", "topk"),
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
    DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders
)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk
""",
)
def win_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family (free capability per SURVEY.md §2.6 note): top-3
    orders per priority via rank ≤ k — the scalable per-group top-k
    (no global sort, no driver collect)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_orderpriority", "rnk")
    )


@register(
    "win_temporal_split_counts",
    tags=("window", "split"),
    oracle=f"""
WITH labeled AS (
  SELECT value,
    CASE WHEN ROW_NUMBER() OVER {_W}
           <= FLOOR(COUNT(*) OVER {_W_PART} * 0.8)
         THEN 'train' ELSE 'test' END AS split
  FROM events
)
SELECT split, COUNT(*) AS n, {sql_dsum('value')} AS total_value
FROM labeled GROUP BY split ORDER BY split
""",
)
def win_temporal_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W13 — per-user temporal 80/20 holdout (shuffle=False split,
    datamining_analysis.py:84) as row_number vs partition count, then
    aggregated to verify the split boundaries exactly."""
    e = load_table(spark, sf_dir, "events")
    w = _events_w()
    labeled = e.select(
        "value", temporal_split(w, ["user_id"], 0.8).alias("split")
    )
    return (
        labeled.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .orderBy("split")
    )


@register(
    "win_rolling_corr_daily",
    tags=("window", "corr", "pivot"),
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
    {sql_davg("CASE WHEN event_type = 'click' THEN value END")} AS click_avg,
    {sql_davg("CASE WHEN event_type = 'view' THEN value END")}  AS view_avg
  FROM events GROUP BY 1
)
SELECT day, click_avg, view_avg,
  CASE WHEN COUNT(click_avg * view_avg) OVER w7 >= 7 THEN
    {sql_dcorr_w('click_avg', 'view_avg', '(ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)')}
  END AS corr7
FROM daily
WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
""",
)
def win_rolling_corr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 — rolling pairwise correlation (datavisualization.py:725-734):
    pivot event types to columns per day (U2 shape), then 7-day windowed
    Pearson corr from exact moments.

    The day-level series is bounded (one row per day), so the
    unpartitioned window is safe at any raw-event scale — the heavy
    lifting happened in the grouped pre-aggregation."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            davg(F.when(F.col("event_type") == "click", F.col("value"))).alias(
                "click_avg"
            ),
            davg(F.when(F.col("event_type") == "view", F.col("value"))).alias(
                "view_avg"
            ),
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    cnt = F.count(F.col("click_avg") * F.col("view_avg")).over(w7)
    return daily.select(
        "day",
        "click_avg",
        "view_avg",
        F.when(cnt >= 7, dcorr_w("click_avg", "view_avg", w7)).alias("corr7"),
    ).orderBy("day")


@register(
    "win_percent_rank_cume",
    tags=("window", "percent-rank", "cume-dist"),
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6)    AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderpriority, o_totalprice, o_orderkey
""",
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two relative-rank window members (percent_rank, cume_dist)
    completing the ranking family (rank/dense_rank/ntile are elsewhere
    in the registry).  Partitioned by priority — no global sort; both
    functions share one window spec, so one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("o_orderpriority", "o_totalprice", "o_orderkey")


_HOUR_US = 3600 * 1_000_000


@register(
    "win_range_frame_hour",
    tags=("window", "range-frame", "sliding"),
    oracle=f"""
SELECT event_id, event_type, ts,
       COUNT(*) OVER w AS n_last_hour,
       {sql_dsum_w('value', f'(PARTITION BY event_type ORDER BY epoch_us(ts) RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)')} AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
ORDER BY event_type, ts, event_id
""",
)
def win_range_frame_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window keyed on event TIME, not row count:
    per event, activity over the trailing hour (the frame Spark's
    ``rangeBetween`` expresses over a numeric ordering — here epoch
    micros, so frame edges are exact integer comparisons on both
    engines).  Rows with equal timestamps share a frame by RANGE
    semantics, which is why the aggregate — unlike a ROWS frame — is
    well-defined without a unique tiebreak."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(ts_us)
        .rangeBetween(-_HOUR_US, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        dsum_w("value", w).alias("value_last_hour"),
    ).orderBy("event_type", "ts", "event_id")


@register(
    "win_first_last_nth",
    tags=("window", "first-value", "nth-value"),
    oracle="""
SELECT user_id, event_id, ts,
       FIRST_VALUE(value) OVER w AS first_val,
       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_val,
       NTH_VALUE(value, 3) OVER w AS third_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-navigation window members (first_value / last_value /
    nth_value) completing §2.6's window family.  Note the frame trap
    both engines share: last_value under the DEFAULT frame (unbounded
    preceding → CURRENT ROW) returns the current row, so the whole-
    partition last needs an explicit unbounded-following frame — the
    query encodes that correctly in both dialects."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 3).over(w).alias("third_val"),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "win_longest_value_streaks",
    tags=("window", "streaks", "gaps-and-islands"),
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN value >= 500.0 THEN 1 ELSE 0 END AS is_high,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id,
                              CASE WHEN value >= 500.0 THEN 1 ELSE 0 END
                            ORDER BY ts, event_id) AS rn_f
  FROM events
),
islands AS (
  SELECT user_id, is_high, rn - rn_f AS grp, COUNT(*)::BIGINT AS streak_len
  FROM seq GROUP BY user_id, is_high, rn - rn_f
)
SELECT user_id,
       MAX(CASE WHEN is_high = 1 THEN streak_len ELSE 0 END)::BIGINT
         AS longest_high_streak,
       MAX(CASE WHEN is_high = 0 THEN streak_len ELSE 0 END)::BIGINT
         AS longest_low_streak,
       COUNT(*)::BIGINT AS n_streaks
FROM islands
GROUP BY user_id
ORDER BY user_id
""",
)
def win_longest_value_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-run lengths per user (value above/below a
    threshold) by the rn − rn_per_flag gaps-and-islands identity: two
    row_number windows and two grouped aggregations, ALL sharing the
    user_id hash partitioning — one shuffle end to end for a pattern
    naive implementations write as a per-user driver loop.  (The
    stock-domain reading: longest winning/losing streak per ticker.)"""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    is_high = F.when(F.col("value") >= 500.0, 1).otherwise(0)
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_flag = Window.partitionBy("user_id", "is_high").orderBy("ts", "event_id")
    seq = e.withColumn("is_high", is_high).select(
        "user_id",
        "is_high",
        (F.row_number().over(w_all) - F.row_number().over(w_flag)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "is_high", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("is_high") == 1, F.col("streak_len")).otherwise(0)
            ).alias("longest_high_streak"),
            F.max(
                F.when(F.col("is_high") == 0, F.col("streak_len")).otherwise(0)
            ).alias("longest_low_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )
