"""Misc batch: streaming windowed distinct, the SQL PIVOT clause, and
day-of-week seasonal decomposition — surface breadth (streaming distinct
aggregation, SQL pivot syntax) plus the classic time-series seasonality
split the reference's stock domain implies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .exact import davg, dstddev_samp, sql_davg, sql_dstddev_samp
from .registry import register

_US_10M = 10 * 60 * 1_000_000


@register(
    "stream_tumbling_distinct",
    tags=("streaming", "window", "distinct"),
    oracle=f"""
SELECT
  make_timestamp((epoch_us(ts) // {_US_10M}) * {_US_10M}) AS window_start,
  event_type,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def stream_tumbling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 10-minute tumbling window and event type —
    the windowed-cardinality query every live dashboard runs.  Batch-
    equivalent form of the streaming plan (``F.window`` + distinct
    agg); Spark expands the distinct into a two-phase aggregate
    (partial by (window, type, user), then final) — no per-window value
    buffers.  In a live ``readStream`` you trade this for
    ``approx_count_distinct`` (streaming state must be mergeable and
    bounded — HLL is the 100 TB/unbounded-stream answer, exposed as
    ``agg_hll_sketch_union``); the exact batch form is what the
    watermark-replay correctness check compares against."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_users",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )


_PIVOT_SQL = """
SELECT * FROM (
  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS DECIMAL(28,6)) AS q
  FROM lineitem
)
PIVOT (
  CAST(SUM(q) AS DOUBLE) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f)
)
ORDER BY l_returnflag
"""


@register(
    "sql_pivot_clause",
    tags=("sql-api", "pivot", "agg"),
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(28,6)) END) AS DOUBLE)
         AS qty_o,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(28,6)) END) AS DOUBLE)
         AS qty_f
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (Spark SQL syntax surface; the
    DataFrame ``groupBy().pivot()`` twin is olap_pivot_*): quantity by
    return flag pivoted on line status with an explicit IN list —
    Catalyst compiles it to the same two-phase ``PivotFirst`` aggregate
    as the DataFrame form.  The oracle spells it as conditional
    aggregation (DuckDB's PIVOT has different naming rules); sums stay
    in decimal through the pivot and convert once at the end."""
    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SQL)


@register(
    "mining_seasonal_indices",
    tags=("mining", "seasonality", "time-series"),
    oracle=f"""
WITH base AS (
  SELECT dayofweek(ts) AS dow, value FROM events
),
idx AS (
  SELECT dow,
         COUNT(*) AS n_events,
         ROUND({sql_davg('value')}, 6) AS dow_mean
  FROM base GROUP BY dow
),
g AS (SELECT ROUND({sql_davg('value')}, 6) AS grand_mean FROM base),
resid AS (
  SELECT b.dow, b.value - i.dow_mean AS r
  FROM base b JOIN idx i USING (dow)
)
SELECT i.dow, i.n_events,
       i.dow_mean - g.grand_mean AS seasonal_index,
       (SELECT {sql_dstddev_samp('r')} FROM resid WHERE resid.dow = i.dow)
         AS residual_std
FROM idx i CROSS JOIN g
ORDER BY i.dow
""",
)
def mining_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive day-of-week seasonal decomposition — the first model
    every ops/traffic dashboard fits: per-weekday mean vs grand mean
    (the seasonal index) and the de-seasonalized residual spread (what
    anomaly thresholds should be set against INSTEAD of the raw std
    when traffic is periodic).  Day means round to 6 dp on both engines
    before subtraction so residuals are bit-identical; two scans (index
    pass + residual pass), the 7-row index table broadcast back.
    Spark's ``dayofweek`` is 1-based Sunday — shifted to DuckDB's
    0-based convention."""
    e = load_table(spark, sf_dir, "events")
    base = e.select((F.dayofweek("ts") - 1).alias("dow"), "value")
    idx = base.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(davg("value"), 6).alias("dow_mean"),
    )
    g = base.agg(F.round(davg("value"), 6).alias("grand_mean"))
    resid_std = (
        base.join(F.broadcast(idx.select("dow", "dow_mean")), "dow")
        .select("dow", (F.col("value") - F.col("dow_mean")).alias("r"))
        .groupBy("dow")
        .agg(dstddev_samp("r").alias("residual_std"))
    )
    return (
        idx.crossJoin(F.broadcast(g))
        .join(resid_std, "dow")
        .select(
            "dow",
            "n_events",
            (F.col("dow_mean") - F.col("grand_mean")).alias("seasonal_index"),
            "residual_std",
        )
        .orderBy("dow")
    )
