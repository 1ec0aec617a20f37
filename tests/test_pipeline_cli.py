"""End-to-end pipeline parity: run the full ETL→OLAP→mining pipeline
into a temp dir and diff every produced CSV against the reference's
committed outputs (numeric-tolerant)."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

REF = "/root/reference"


@pytest.fixture(scope="module")
def out_dir(spark, tmp_path_factory):
    from stock_data_warehouse_analytics_spark.pipeline import (
        run_etl,
        run_mining,
        run_olap,
    )

    out = str(tmp_path_factory.mktemp("pipeline_out"))
    fact = run_etl(spark, f"{REF}/stock_data", os.path.join(out, "cleaned"))
    run_olap(spark, fact, os.path.join(out, "olap_results"))
    run_mining(spark, fact, os.path.join(out, "datamining_results"))
    fact.unpersist()
    return out


def _diff_csv(got_path: str, want_path: str, *, rtol=1e-6, sort_by=None):
    got, want = pd.read_csv(got_path), pd.read_csv(want_path)
    assert list(got.columns) == list(want.columns), (
        got_path, list(got.columns), list(want.columns),
    )
    assert len(got) == len(want), (got_path, len(got), len(want))
    if sort_by:
        got = got.sort_values(sort_by).reset_index(drop=True)
        want = want.sort_values(sort_by).reset_index(drop=True)
    for col in want.columns:
        for i, (a, b) in enumerate(zip(got[col], want[col])):
            if isinstance(b, float) and not isinstance(b, bool):
                if math.isnan(b):
                    assert isinstance(a, float) and math.isnan(a), (got_path, col, i)
                else:
                    assert math.isclose(a, b, rel_tol=rtol, abs_tol=1e-9), (
                        got_path, col, i, a, b,
                    )
            else:
                assert a == b, (got_path, col, i, a, b)


ALL_OUTPUTS = [
    ("cleaned/All.csv", ["Ticker", "Date"], 1e-9),
    ("cleaned/HVN.csv", ["Date"], 1e-9),
    ("cleaned/VTR.csv", ["Date"], 1e-9),
    ("olap_results/01_quarterly_price.csv", None, 1e-9),
    ("olap_results/02_growth_24_25.csv", None, 1e-9),
    ("olap_results/03_monthly_volume.csv", None, 1e-9),
    ("olap_results/04_stats_2025.csv", None, 1e-9),
    ("datamining_results/01_regression_same_day.csv", None, 1e-6),
    ("datamining_results/02_regression_next_day.csv", None, 1e-5),
    ("datamining_results/04_anomalies.csv", None, 1e-6),
]


@pytest.mark.parametrize("rel,sort_by,rtol", ALL_OUTPUTS)
def test_output_matches_reference(out_dir, rel, sort_by, rtol):
    _diff_csv(os.path.join(out_dir, rel), os.path.join(REF, rel), rtol=rtol, sort_by=sort_by)


def test_kmeans_output_partition(out_dir):
    got = pd.read_csv(os.path.join(out_dir, "datamining_results/03_kmeans_clusters.csv"))
    want = pd.read_csv(f"{REF}/datamining_results/03_kmeans_clusters.csv")
    got, want = got.sort_values("Ticker"), want.sort_values("Ticker")

    def parts(df):
        g = {}
        for t, c in zip(df.Ticker, df.Cluster):
            g.setdefault(c, set()).add(t)
        return sorted(frozenset(s) for s in g.values())

    assert parts(got) == parts(want)
