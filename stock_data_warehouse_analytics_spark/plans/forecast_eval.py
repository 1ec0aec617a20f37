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


# -------------------------------------------- Holt–Winters seasonal

_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.1, 0.2
_HW_PERIOD = 7
_HW_HORIZON = 7


@register(
    "win_holt_winters_forecast",
    oracle=None,  # coupled three-state seasonal recurrence — no SQL
    # oracle; substitute:
    # tests/test_technical_differential.py::test_holt_winters_matches_explicit_recurrence
    tags=(
        "window",
        "technical",
        "recurrence",
        "forecast",
        "seasonal",
        "rows-only",
    ),
)
def win_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT–WINTERS additive triple-exponential smoothing (level +
    trend + weekly seasonality, α=0.3 β=0.1 γ=0.2, m=7) over each
    event type's daily count series, emitting the m-step-ahead
    forecast fan ŷ(h) = L_N + h·T_N + S_{N+h−m} for h = 1..7 plus the
    final states — the seasonal member of the forecast-recurrence
    family (`win_holt_linear_forecast` has no seasonality;
    `eval_forecast_backtest` showed seasonal-naive beats naive-1 on
    exactly this series, so the production next step is a model WITH
    the seasonal state).

    Initialization (classic two-full-period scheme): L₀ = mean of week
    1, T₀ = (mean of week 2 − mean of week 1)/m, S_i = y_i − L₀ for
    the first week; the recurrence starts at t = m.  Rows-only by
    design (three COUPLED states per step — inexpressible as frame
    aggregates or a single grouped-ewm, and an unrolled SQL mirror of
    30 steps × 3 states is not an oracle, it is a second copy);
    substitute check is the explicit-recurrence differential test
    named above.

    Scale shape: facts collapse to the calendar-bounded (type, day)
    count table in one grouped agg; the recurrence runs inside ONE
    applyInPandas task per event type (states are O(m) per series;
    |types| tasks of ≤|days| rows — trivially parallel across series,
    which is the real production shape: thousands of independent
    series, each small)."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("y"))

    m, hor = _HW_PERIOD, _HW_HORIZON
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["y"].to_numpy(dtype="float64")
        et = pdf["event_type"].iloc[0]
        if len(y) < 2 * m:
            return pd.DataFrame(
                columns=["event_type", "h", "forecast", "level", "trend"]
            )
        lvl = float(y[:m].mean())
        trd = float((y[m : 2 * m].mean() - y[:m].mean()) / m)
        season = [float(y[i] - lvl) for i in range(m)]
        for t in range(m, len(y)):
            s_prev = season[t % m]
            l_prev = lvl
            lvl = a * (y[t] - s_prev) + (1 - a) * (lvl + trd)
            trd = b * (lvl - l_prev) + (1 - b) * trd
            season[t % m] = g * (y[t] - lvl) + (1 - g) * s_prev
        n = len(y)
        rows = [
            (
                et,
                h,
                lvl + h * trd + season[(n + h - 1) % m],
                lvl,
                trd,
            )
            for h in range(1, hor + 1)
        ]
        return pd.DataFrame(
            rows, columns=["event_type", "h", "forecast", "level", "trend"]
        )

    return (
        daily.groupBy("event_type")
        .applyInPandas(
            fit,
            schema="event_type string, h int, forecast double,"
            " level double, trend double",
        )
        .orderBy("event_type", "h")
    )
