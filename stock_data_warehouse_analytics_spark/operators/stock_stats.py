"""Statistical analytics M6–M7, A7/A8/A10–A12, W3–W10 on the stock fact
table (SURVEY.md §2.9) — the ``datavisualization.py`` notebook surface.

Everything is windows + one grouped agg per result; the only join is the
broadcast stats-enrichment J1.  No driver-side loops: the reference's
per-ticker dict iteration (datavisualization.py:590) becomes a single
``groupBy("Ticker")`` plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.derivations import np_round
from .windows import (
    cumulative_product,
    cumulative_sum,
    ordered_window,
    rolling_mean,
    rolling_stddev,
    running_max,
)

__all__ = [
    "cumulative_returns",
    "rolling_volatility",
    "summary_statistics",
    "volume_spike_ma20",
    "volume_spike_global",
    "ohlcv_corr_matrix",
    "logreturn_corr_pairs",
    "rolling_corr_pair",
]

TRADING_DAYS = 252
RISK_FREE_RATE_ANNUAL = 0.03


def _w(fact: DataFrame):
    return ordered_window(["Ticker"], ["Date"])


def cumulative_returns(fact: DataFrame) -> DataFrame:
    """W3+W4 — CumulativeLogReturn = cumsum(LogReturn) per ticker;
    CumulativeReturn = exp(·) (datavisualization.py:277-280)."""
    w = _w(fact)
    df = fact.withColumn("CumulativeLogReturn", cumulative_sum("LogReturn", w))
    return df.withColumn("CumulativeReturn", F.exp("CumulativeLogReturn"))


def rolling_volatility(fact: DataFrame, window: int = 20) -> DataFrame:
    """W8 — rolling sample std of LogReturn (20d default, 60d variant;
    datavisualization.py:411-417,493-499), pandas min_periods=window."""
    w = _w(fact)
    return fact.withColumn(
        "RollingVolatility", rolling_stddev("LogReturn", w, window)
    )


def summary_statistics(fact: DataFrame) -> DataFrame:
    """M6 — per-ticker summary panel (datavisualization.py:582-631):
    mean daily LogReturn, annualized return ``exp(μ·252)−1``, annualized
    vol ``σ·√252`` (ddof=1), Sharpe vs 3% risk-free, max drawdown
    (W5–W7 on gross ``1+Return`` — Return is in PERCENT there, a
    reference quirk reproduced exactly), average volume.

    One windowed pre-pass for drawdown + one grouped agg — no
    per-ticker iteration."""
    w = _w(fact)
    gross = F.lit(1.0) + F.col("Return")
    cum = cumulative_product(gross, w)
    runmax = running_max(cum, w)
    enriched = fact.withColumn("_dd", (cum - runmax) / runmax)

    agg = enriched.groupBy("Ticker").agg(
        F.avg("LogReturn").alias("_mu"),
        F.stddev_samp("LogReturn").alias("_sigma"),
        F.min("_dd").alias("_mdd"),
        F.avg("Volume").alias("Average Volume"),
    )
    ann_ret = F.exp(F.col("_mu") * TRADING_DAYS) - 1
    ann_vol = F.col("_sigma") * F.sqrt(F.lit(float(TRADING_DAYS)))
    return agg.select(
        "Ticker",
        (F.col("_mu") * 100).alias("Mean Daily Return (%)"),
        (ann_ret * 100).alias("Annualized Return (%)"),
        (ann_vol * 100).alias("Annualized Volatility (%)"),
        ((ann_ret - RISK_FREE_RATE_ANNUAL) / ann_vol).alias("Sharpe Ratio"),
        (F.col("_mdd") * 100).alias("Max Drawdown (%)"),
        "Average Volume",
    ).orderBy("Ticker")


def volume_spike_ma20(fact: DataFrame) -> DataFrame:
    """M7a — MA20 spike rule (datavisualization.py:635-675): spike day
    iff Volume > 2.5·MA20 (rolling mean, min_periods=20; null MA20
    compares False like pandas), then mean |Return| by spike flag."""
    w = _w(fact)
    ma20 = rolling_mean("Volume", w, 20)
    df = fact.withColumn(
        "Is_Spike_Day",
        F.coalesce(F.col("Volume") > 2.5 * ma20, F.lit(False)),
    )
    return (
        df.groupBy("Is_Spike_Day")
        .agg(F.avg(F.abs("Return")).alias("Mean Absolute Return"))
        .orderBy("Is_Spike_Day")
    )


def volume_spike_global(fact: DataFrame) -> DataFrame:
    """M7b — global μ+2σ spike rule (datavisualization.py:748-802):
    per-ticker Volume mean/std (A8), broadcast-joined back (J1), spike
    iff Volume > μ+2σ, mean |Return| pivoted by flag + ratio, round 4.

    The 6-row stats side is broadcast — the reference's only true join,
    in its scalable form."""
    stats = fact.groupBy("Ticker").agg(
        F.avg("Volume").alias("_mean"), F.stddev_samp("Volume").alias("_std")
    )
    df = fact.join(F.broadcast(stats), "Ticker", "left")
    df = df.withColumn(
        "IsSpike",
        F.coalesce(F.col("Volume") > F.col("_mean") + 2 * F.col("_std"), F.lit(False)),
    )
    wide = (
        df.groupBy("Ticker")
        .pivot("IsSpike", [False, True])
        .agg(F.avg(F.abs("Return")))
        .withColumnsRenamed(
            {"false": "Mean |Return| (Non-Spike)", "true": "Mean |Return| (Spike)"}
        )
    )
    return wide.select(
        "Ticker",
        np_round("Mean |Return| (Non-Spike)", 4).alias("Mean |Return| (Non-Spike)"),
        np_round("Mean |Return| (Spike)", 4).alias("Mean |Return| (Spike)"),
        np_round(
            F.col("Mean |Return| (Spike)") / F.col("Mean |Return| (Non-Spike)"), 4
        ).alias("Spike/NonSpike Ratio"),
    ).orderBy("Ticker")


def ohlcv_corr_matrix(fact: DataFrame) -> DataFrame:
    """A11a — per-ticker pairwise Pearson corr of OHLCV
    (datavisualization.py:240-248), long format (Ticker, col_a, col_b,
    corr): one grouped agg computing all 15 pairs, no per-ticker loop."""
    cols = ["Open", "High", "Low", "Close", "Volume"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i:]]
    agg = fact.groupBy("Ticker").agg(
        *[F.corr(a, b).alias(f"{a}__{b}") for a, b in pairs]
    )
    structs = [
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col(f"{a}__{b}").alias("corr"),
        )
        for a, b in pairs
    ]
    return (
        agg.select("Ticker", F.explode(F.array(*structs)).alias("p"))
        .select("Ticker", "p.col_a", "p.col_b", "p.corr")
        .orderBy("Ticker", "col_a", "col_b")
    )


def _logreturn_pivot(fact: DataFrame, tickers: list[str]) -> DataFrame:
    """U2 — Date × Ticker wide frame of LogReturn
    (datavisualization.py:694)."""
    return (
        fact.groupBy("Date")
        .pivot("Ticker", tickers)
        .agg(F.first("LogReturn"))
    )


def logreturn_corr_pairs(fact: DataFrame, *, covariance: bool = False) -> DataFrame:
    """A11b/A12 — cross-ticker corr/cov matrix of LogReturn
    (datavisualization.py:694-714), long format (ticker_a, ticker_b,
    value).  Pairwise-complete semantics match pandas (F.corr ignores
    null pairs)."""
    tickers = sorted(r[0] for r in fact.select("Ticker").distinct().collect())
    wide = _logreturn_pivot(fact, tickers)
    fn = F.covar_samp if covariance else F.corr
    pairs = [(a, b) for i, a in enumerate(tickers) for b in tickers[i:]]
    agg = wide.agg(*[fn(a, b).alias(f"{a}__{b}") for a, b in pairs])
    structs = [
        F.struct(
            F.lit(a).alias("ticker_a"), F.lit(b).alias("ticker_b"),
            F.col(f"{a}__{b}").alias("value"),
        )
        for a, b in pairs
    ]
    return (
        agg.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.ticker_a", "p.ticker_b", "p.value")
        .orderBy("ticker_a", "ticker_b")
    )


def rolling_corr_pair(
    fact: DataFrame, t1: str = "HVN", t2: str = "VJC", window: int = 30
) -> DataFrame:
    """W10 — 30-day rolling correlation between two tickers' LogReturn
    (datavisualization.py:725-734): pivot to columns, windowed corr over
    Date with a full-window mask (pandas min_periods=window)."""
    wide = _logreturn_pivot(fact, [t1, t2])
    w = Window.orderBy("Date").rowsBetween(-(window - 1), 0)
    cnt = F.count(F.col(t1) * F.col(t2)).over(w)
    return (
        wide.select(
            "Date",
            F.when(cnt >= window, F.corr(t1, t2).over(w)).alias("rolling_corr"),
        )
        .filter(F.col("rolling_corr").isNotNull())
        .orderBy("Date")
    )
