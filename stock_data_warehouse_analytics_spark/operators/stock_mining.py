"""Data-mining operators M1–M5 (SURVEY.md §2.9) — golden-parity targets
for ``/root/reference/datamining_results/``.

Per-group model fitting uses ``applyInPandas`` — the idiomatic Spark
replacement for the reference's "loop over ``df['Ticker'].unique()`` and
fit sklearn" anti-pattern (datamining_analysis.py:44,77; SURVEY.md
§7.5): one Arrow-batched task per group, parallel across executors,
no driver-side loop.  OLS itself is closed-form least squares via
numpy (sklearn is not available here; ``LinearRegression`` is plain
OLS, so ``lstsq`` reproduces it to float precision).

The scale-out clustering path uses ``pyspark.ml.clustering.KMeans``;
for the reference's 6-point input an exact enumerated k-means is also
provided (globally optimal, deterministic — label-free comparison per
SURVEY.md §4.2 item 5).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .windows import lag_pct_change, lead_, ordered_window, zscore

__all__ = [
    "prepare_mining_frame",
    "regression_same_day",
    "regression_next_day",
    "kmeans_features",
    "kmeans_clusters",
    "kmeans_exact_small",
    "zscore_anomalies",
]

_REG_SCHEMA = "Ticker string, R2_Score double, MSE double, Intercept double"


def prepare_mining_frame(fact: DataFrame, min_year: int = 2024) -> DataFrame:
    """datamining_analysis.py:20-23 — drop null dates, year filter,
    canonical (Ticker, Date) order."""
    return fact.na.drop(subset=["Date"]).filter(F.year("Date") >= min_year)


def _ols_fit_metrics(X: np.ndarray, y: np.ndarray) -> tuple[float, float, float]:
    """OLS with intercept; in-/out-of-sample metrics computed by caller.
    Returns (coef..., handled by caller) — here fit on given data and
    return (r2, mse, intercept) evaluated on the same data."""
    A = np.column_stack([np.ones(len(X)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    pred = A @ beta
    resid = y - pred
    ss_res = float(resid @ resid)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    mse = ss_res / len(y)
    return r2, mse, float(beta[0])


def regression_same_day(mining: DataFrame, min_rows: int = 20) -> DataFrame:
    """M1 — per-ticker OLS ``Close ~ Open+High+Low+Volume``, in-sample
    R²/MSE/intercept, sorted R² desc (datamining_analysis.py:44-65).
    Golden: ``01_regression_same_day.csv``."""
    cols = ["Open", "High", "Low", "Volume", "Close"]
    base = mining.na.drop(subset=cols).select("Ticker", *cols)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_rows:  # F7 min-group-size guard
            return pd.DataFrame(columns=["Ticker", "R2_Score", "MSE", "Intercept"])
        X = pdf[["Open", "High", "Low", "Volume"]].to_numpy(dtype=float)
        y = pdf["Close"].to_numpy(dtype=float)
        r2, mse, intercept = _ols_fit_metrics(X, y)
        return pd.DataFrame(
            {
                "Ticker": [pdf["Ticker"].iloc[0]],
                "R2_Score": [r2],
                "MSE": [mse],
                "Intercept": [intercept],
            }
        )

    return (
        base.groupBy("Ticker")
        .applyInPandas(fit, schema=_REG_SCHEMA)
        .orderBy(F.desc("R2_Score"))
    )


def regression_next_day(mining: DataFrame, min_rows: int = 20) -> DataFrame:
    """M2 — next-day regression (datamining_analysis.py:67-100):
    lead target (W1), *global* population standardization of features
    (W12 — sklearn StandardScaler ddof=0 across all tickers jointly,
    the reference's deliberate leakage quirk), per-ticker temporal
    80/20 holdout (W13, ``ceil(0.2n)`` test rows like sklearn), fit on
    train, report out-of-sample R²/MSE.  Golden:
    ``02_regression_next_day.csv``.

    Global scaling is computed as an aggregate + broadcast literal join
    rather than an unpartitioned window — no single-partition shuffle
    at scale."""
    features = ["Open", "High", "Low", "Close", "Volume"]
    w = ordered_window(["Ticker"], ["Date"])
    df = (
        mining.withColumn("Target_NextDay", lead_("Close", w))
        .na.drop(subset=["Target_NextDay"])
        .select("Ticker", "Date", "Target_NextDay", *features)
    )

    stats = df.select(
        *[F.avg(c).alias(f"{c}_mu") for c in features],
        *[F.stddev_pop(c).alias(f"{c}_sd") for c in features],
    )
    df = df.crossJoin(F.broadcast(stats))
    df = df.select(
        "Ticker",
        "Date",
        "Target_NextDay",
        *[
            ((F.col(c) - F.col(f"{c}_mu")) / F.col(f"{c}_sd")).alias(c)
            for c in features
        ],
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < min_rows:
            return pd.DataFrame(columns=["Ticker", "R2_Score", "MSE", "Intercept"])
        pdf = pdf.sort_values("Date", kind="stable")
        n = len(pdf)
        n_test = int(np.ceil(n * 0.2))  # sklearn train_test_split ceil
        train, test = pdf.iloc[: n - n_test], pdf.iloc[n - n_test :]
        A = np.column_stack(
            [np.ones(len(train)), train[features].to_numpy(dtype=float)]
        )
        beta, *_ = np.linalg.lstsq(A, train["Target_NextDay"].to_numpy(), rcond=None)
        At = np.column_stack([np.ones(len(test)), test[features].to_numpy(dtype=float)])
        y_t = test["Target_NextDay"].to_numpy(dtype=float)
        pred = At @ beta
        ss_res = float(((y_t - pred) ** 2).sum())
        ss_tot = float(((y_t - y_t.mean()) ** 2).sum())
        return pd.DataFrame(
            {
                "Ticker": [pdf["Ticker"].iloc[0]],
                "R2_Score": [1.0 - ss_res / ss_tot],
                "MSE": [ss_res / len(y_t)],
                "Intercept": [float(beta[0])],
            }
        )

    return (
        df.groupBy("Ticker")
        .applyInPandas(fit, schema=_REG_SCHEMA)
        .orderBy(F.desc("R2_Score"))
    )


def kmeans_features(mining: DataFrame) -> DataFrame:
    """A9 — per-ticker cluster features: mean pct_change Return (W2 —
    note datamining_analysis.py:107 *overwrites* the ETL Return with
    pct_change) and mean Volume."""
    w = ordered_window(["Ticker"], ["Date"])
    feats = mining.withColumn("Return", lag_pct_change("Close", w))
    return (
        feats.groupBy("Ticker")
        .agg(F.avg("Return").alias("Return"), F.avg("Volume").alias("Volume"))
        .na.drop()
        .orderBy("Ticker")
    )


def _standardize_pop(pdf: pd.DataFrame, cols: list[str]) -> np.ndarray:
    X = pdf[cols].to_numpy(dtype=float)
    return (X - X.mean(axis=0)) / X.std(axis=0)  # ddof=0 (StandardScaler)


def kmeans_exact_small(features: DataFrame, k: int = 3) -> DataFrame:
    """M4 exact path: globally optimal k-means by enumerating set
    partitions — deterministic, no seed sensitivity.  Only for bounded
    group counts (the reference clusters 6 tickers; S(6,3)=90
    partitions).  Compare by co-membership, not label values
    (SURVEY.md §4.2 item 5)."""
    pdf = features.toPandas().sort_values("Ticker").reset_index(drop=True)
    n = len(pdf)
    if n > 12:
        raise ValueError("exact k-means is for bounded inputs; use kmeans_clusters")
    X = _standardize_pop(pdf, ["Return", "Volume"])

    best, best_sse = None, np.inf
    for assign in itertools.product(range(k), repeat=n):
        if len(set(assign)) != k:
            continue
        a = np.asarray(assign)
        sse = 0.0
        for c in range(k):
            pts = X[a == c]
            sse += float(((pts - pts.mean(axis=0)) ** 2).sum())
        if sse < best_sse - 1e-12:
            best, best_sse = a, sse
    pdf["Cluster"] = best
    spark = features.sparkSession
    return spark.createDataFrame(pdf)


def kmeans_clusters(features: DataFrame, k: int = 3, seed: int = 42) -> DataFrame:
    """M4 scale path — ``pyspark.ml`` StandardScaler + KMeans(seed):
    distributed Lloyd over any number of groups.  Label ids are not
    comparable across implementations; verify partition structure."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembled = VectorAssembler(
        inputCols=["Return", "Volume"], outputCol="_raw"
    ).transform(features)
    scaled = (
        StandardScaler(inputCol="_raw", outputCol="_feat", withMean=True, withStd=True)
        .fit(assembled)
        .transform(assembled)
    )
    model = KMeans(k=k, seed=seed, featuresCol="_feat", predictionCol="Cluster").fit(
        scaled
    )
    return model.transform(scaled).select("Ticker", "Return", "Volume", "Cluster")


def zscore_anomalies(mining: DataFrame, threshold: float = 2.0) -> DataFrame:
    """M5 — per-ticker z-score on Close (ddof=1), |z| > 2, sorted
    (Ticker, Date) (datamining_analysis.py:123-131).  Golden:
    ``04_anomalies.csv`` — which carries the pct_change-overwritten
    Return column (line 107 runs before line 127)."""
    w = ordered_window(["Ticker"], ["Date"])
    df = mining.withColumn("Return", lag_pct_change("Close", w))
    df = df.withColumn("Z_Score", zscore("Close", ["Ticker"]))
    return df.filter(F.abs("Z_Score") > threshold).orderBy("Ticker", "Date")
