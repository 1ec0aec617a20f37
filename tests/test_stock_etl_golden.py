"""Golden-output parity: run our Spark ETL + OLAP on the reference's own
raw CSVs (read-only at /root/reference) and compare against its
committed outputs (SURVEY.md §5.2 item 1).

Floats compare with tight tolerance (goldens carry full-precision
doubles written by pandas; aggregation order differs), ints/dates exact.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

REF = "/root/reference"
RAW_DIR = f"{REF}/stock_data"


@pytest.fixture(scope="module")
def fact(spark):
    from stock_data_warehouse_analytics_spark.sources.stock_csv import (
        load_stock_facts,
    )

    df = load_stock_facts(spark, RAW_DIR)
    df.cache()  # bounded fact table — the one cached intermediate (§7.1)
    yield df
    df.unpersist()


def _assert_frame_close(got: pd.DataFrame, want: pd.DataFrame, rtol=1e-9, atol=1e-12):
    assert list(got.columns) == list(want.columns), (
        f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"
    for col in want.columns:
        g, w = got[col].tolist(), want[col].tolist()
        for i, (a, b) in enumerate(zip(g, w)):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or (isinstance(b, float) and math.isnan(b))
            if a_nan or b_nan:
                assert a_nan and b_nan, f"{col}[{i}]: {a!r} vs {b!r}"
            elif isinstance(b, float):
                assert math.isclose(float(a), b, rel_tol=rtol, abs_tol=atol), (
                    f"{col}[{i}]: {a!r} vs {b!r}"
                )
            else:
                assert a == b, f"{col}[{i}]: {a!r} vs {b!r}"


def test_cleaned_all_parity(fact):
    want = pd.read_csv(f"{REF}/cleaned/All.csv", parse_dates=["Date"])
    got = fact.toPandas()
    got["Date"] = pd.to_datetime(got["Date"])
    key = ["Ticker", "Date"]
    want = want.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)[list(want.columns)]
    assert len(got) == len(want)
    # Volume is nullable int in pandas (read as float when nulls exist)
    for col in want.columns:
        if col in ("Date", "Ticker"):
            assert got[col].equals(want[col]), col
        else:
            import numpy as np

            a = got[col].astype(float).to_numpy()
            b = want[col].astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            close = np.isclose(a, b, rtol=1e-9, atol=1e-12)
            assert (both_nan | close).all(), (
                f"{col}: first diff at {np.argmin(both_nan | close)}: "
                f"{a[np.argmin(both_nan | close)]} vs {b[np.argmin(both_nan | close)]}"
            )


@pytest.fixture(scope="module")
def olap_df(fact):
    from stock_data_warehouse_analytics_spark.operators.stock_olap import (
        prepare_olap_frame,
    )

    return prepare_olap_frame(fact)


def test_quarterly_price_golden(olap_df):
    from stock_data_warehouse_analytics_spark.operators.stock_olap import (
        quarterly_price,
    )

    want = pd.read_csv(f"{REF}/olap_results/01_quarterly_price.csv")
    got = quarterly_price(olap_df).toPandas()
    _assert_frame_close(got, want)


def test_yearly_growth_golden(olap_df):
    from stock_data_warehouse_analytics_spark.operators.stock_olap import (
        yearly_growth,
    )

    want = pd.read_csv(f"{REF}/olap_results/02_growth_24_25.csv")
    got = yearly_growth(olap_df).toPandas()
    got.columns = [str(c) for c in got.columns]
    want.columns = [str(c) for c in want.columns]
    _assert_frame_close(got, want)


def test_monthly_volume_golden(olap_df):
    from stock_data_warehouse_analytics_spark.operators.stock_olap import (
        monthly_volume,
    )

    want = pd.read_csv(f"{REF}/olap_results/03_monthly_volume.csv")
    got = monthly_volume(olap_df).toPandas()
    _assert_frame_close(got, want)


def test_stats_2025_golden(olap_df):
    from stock_data_warehouse_analytics_spark.operators.stock_olap import (
        stats_panel,
    )

    want = pd.read_csv(f"{REF}/olap_results/04_stats_2025.csv")
    got = stats_panel(olap_df).toPandas()
    _assert_frame_close(got, want)


def test_parser_edge_cases(spark):
    """C1–C4 against adversarial strings (SURVEY.md §5.2 item 3)."""
    from pyspark.sql import functions as F

    from stock_data_warehouse_analytics_spark.functions.parsers import (
        parse_date,
        parse_number,
        parse_percent,
        parse_volume,
    )

    rows = [
        ("903.30K", "—", "-2.41%", "26/09/2025"),
        ("1.76M", "36,500.0", "0.00%", "1/9/2025"),
        ("2B", "-", "-", "2025-09-26"),
        ("-", "1 234.5", "12.5%", "-"),
        ("nan", "nan", "nan", "nan"),
        ("12345", "", "", ""),
        ("2.5k", "  7,000.25  ", " -0.5% ", " 05/01/2024 "),
    ]
    df = spark.createDataFrame(rows, ["vol", "num", "pct", "dt"])
    out = df.select(
        parse_volume(F.col("vol")).alias("vol"),
        parse_number(F.col("num")).alias("num"),
        parse_percent(F.col("pct")).alias("pct"),
        parse_date(F.col("dt")).alias("dt"),
    ).collect()

    import datetime as dt

    assert [r.vol for r in out] == [903300, 1760000, 2000000000, None, None, 12345, 2500]
    assert [r.num for r in out] == [None, 36500.0, None, 1234.5, None, None, 7000.25]
    assert [r.pct for r in out] == [-2.41, 0.0, None, 12.5, None, None, -0.5]
    assert [r.dt for r in out] == [
        dt.date(2025, 9, 26),
        dt.date(2025, 9, 1),
        dt.date(2025, 9, 26),
        None,
        None,
        None,
        dt.date(2024, 1, 5),
    ]
