"""StockWarehouse facade: the dashboard-replacement surface returns the
same tables as the pipeline operators, including the A6 per-ticker
chart inputs."""

from __future__ import annotations

import math

import pandas as pd
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def wh(spark):
    from stock_data_warehouse_analytics_spark.api import StockWarehouse

    w = StockWarehouse(spark, f"{REF}/stock_data")
    yield w
    w.close()


def test_facade_olap_matches_golden(wh):
    want = pd.read_csv(f"{REF}/olap_results/01_quarterly_price.csv")
    got = wh.quarterly_price().toPandas()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)


def test_facade_reuses_cached_fact(wh):
    f1 = wh.fact
    f2 = wh.fact
    assert f1 is f2
    assert f1.is_cached


def test_facade_anomaly_threshold_param(wh):
    n2 = wh.anomalies(2.0).count()
    n3 = wh.anomalies(3.0).count()
    assert n3 < n2


def test_per_ticker_quarterly_stats_vs_pandas(wh):
    got = wh.per_ticker_quarterly_stats().toPandas()
    frames = [
        pd.read_csv(f"{REF}/cleaned/{t}.csv", parse_dates=["Date"])
        for t in ("HVN", "VJC")
    ]
    pdf = pd.concat(frames)
    pdf = pdf[pdf["Date"].dt.year >= 2024]
    pdf["Year"] = pdf["Date"].dt.year
    pdf["Quarter"] = pdf["Date"].dt.quarter
    want = (
        pdf.groupby(["Ticker", "Year", "Quarter"])["Close"]
        .agg(["mean", "std"])
        .reset_index()
    )
    got_idx = got.set_index(["Ticker", "Year", "Quarter"])
    for _, r in want.iterrows():
        row = got_idx.loc[(r["Ticker"], r["Year"], r["Quarter"])]
        assert math.isclose(row["avg_close"], r["mean"], rel_tol=1e-9)
        assert math.isclose(row["std_close"], r["std"], rel_tol=1e-9)
