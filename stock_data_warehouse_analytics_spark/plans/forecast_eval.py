"""Forecast backtesting: walk-forward seasonal-naive evaluation with
MASE — the scale-free forecast-accuracy readout (Hyndman & Koehler
2006) that complements the Holt/MA forecast operators
(``plans/technical.py``, ``operators/recurrence.py``): producing a
forecast is half the job; a warehouse also has to say whether it beats
the naive baseline.

Cross-engine exactness: the evaluated series is the calendar-bounded
daily count table (integers); absolute errors are exact BIGINTs, MAE
values are single double divisions, and MASE is one double ratio —
no rounding until the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "eval_forecast_backtest",
    tags=("eval", "forecast", "mase", "timeseries"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
lagged AS (
  SELECT event_type, d, y,
         LAG(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS y_s7,
         LAG(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS y_n1
  FROM daily
),
eval_rows AS (
  SELECT event_type,
         y - y_s7 AS e_seasonal,
         y - y_n1 AS e_naive
  FROM lagged WHERE y_s7 IS NOT NULL AND y_n1 IS NOT NULL
)
SELECT event_type,
       COUNT(*) AS n_eval_days,
       ROUND(CAST(SUM(ABS(e_seasonal)) AS DOUBLE) / COUNT(*), 6)
         AS mae_seasonal7,
       ROUND(CAST(SUM(ABS(e_naive)) AS DOUBLE) / COUNT(*), 6)
         AS mae_naive1,
       ROUND((CAST(SUM(ABS(e_seasonal)) AS DOUBLE) / COUNT(*))
             / (CAST(SUM(ABS(e_naive)) AS DOUBLE) / COUNT(*)), 6)
         AS mase,
       ROUND(CAST(SUM(e_seasonal) AS DOUBLE) / COUNT(*), 6)
         AS bias_seasonal7,
       (CAST(SUM(ABS(e_seasonal)) AS DOUBLE) / COUNT(*))
         / (CAST(SUM(ABS(e_naive)) AS DOUBLE) / COUNT(*)) < 1.0e0
         AS beats_naive
FROM eval_rows
GROUP BY event_type
ORDER BY event_type
""",
)
def eval_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALK-FORWARD forecast backtest per event type: the seasonal-
    naive week-ago forecast (y[d−7]) scored against the one-step naive
    baseline (y[d−1]) — MAE of each, their ratio (MASE: < 1 means the
    seasonal model adds value over naive), and the signed bias.

    Scale shape: the fact table collapses once to the CALENDAR-bounded
    (event_type, day) grain (partial agg upstream); both lags come
    from ONE window over that bounded table; the report is a per-type
    grouped aggregate of exact integer errors.  At 100 TB the daily
    table is still ≤ types × days rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("y_s7"),
        F.lag("y", 1).over(w).alias("y_n1"),
    ).filter(F.col("y_s7").isNotNull() & F.col("y_n1").isNotNull())
    e_s = F.col("y") - F.col("y_s7")
    e_n = F.col("y") - F.col("y_n1")
    rows = lagged.select("event_type", e_s.alias("e_seasonal"), e_n.alias("e_naive"))
    n = F.count(F.lit(1))
    mae_s = F.sum(F.abs(F.col("e_seasonal"))).cast("double") / n
    mae_n = F.sum(F.abs(F.col("e_naive"))).cast("double") / n
    return (
        rows.groupBy("event_type")
        .agg(
            n.alias("n_eval_days"),
            F.round(mae_s, 6).alias("mae_seasonal7"),
            F.round(mae_n, 6).alias("mae_naive1"),
            F.round(mae_s / mae_n, 6).alias("mase"),
            F.round(
                F.sum(F.col("e_seasonal")).cast("double") / n, 6
            ).alias("bias_seasonal7"),
            (mae_s / mae_n < F.lit(1.0)).alias("beats_naive"),
        )
        .orderBy("event_type")
    )
