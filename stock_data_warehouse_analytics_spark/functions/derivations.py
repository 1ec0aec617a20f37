"""Derived-column expressions C5–C10 (SURVEY.md §2.3) and time dims.

Reproduces the reference's arithmetic derivations with explicit
null/zero guards (``preprocess_stocks.py:165-176``) and the downstream
time-dimension columns (``olap_analysis.py:32-35``).

Rounding parity note: pandas ``.round`` is numpy's scale-rint-unscale
(half-to-even **on the scaled double**), which differs from Spark's
``bround`` (decimal HALF_EVEN on the shortest repr) on edge values like
2.675.  :func:`np_round` replicates the numpy algorithm exactly so
golden outputs match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "return_pct",
    "average_price",
    "volatility",
    "log_return",
    "np_round",
    "with_time_dims",
]


def return_pct(close: Column, open_: Column) -> Column:
    """Return = (Close−Open)/Open×100, null on null/zero Open
    (preprocess_stocks.py:165-170)."""
    return F.when(
        close.isNull() | open_.isNull() | (open_ == 0), None
    ).otherwise((close - open_) / open_ * 100)


def average_price(high: Column, low: Column) -> Column:
    """Average = (High+Low)/2 (preprocess_stocks.py:172)."""
    return F.when(high.isNull() | low.isNull(), None).otherwise((high + low) / 2)


def volatility(high: Column, low: Column) -> Column:
    """Volatility = High−Low (preprocess_stocks.py:174)."""
    return F.when(high.isNull() | low.isNull(), None).otherwise(high - low)


def log_return(close: Column, open_: Column) -> Column:
    """LogReturn = ln(Close)−ln(Open), null-guarded
    (preprocess_stocks.py:176)."""
    return F.when(
        close.isNull() | open_.isNull() | (open_ == 0), None
    ).otherwise(F.log(close) - F.log(open_))


def np_round(col: Column | str, digits: int = 0) -> Column:
    """numpy/pandas ``.round`` parity: scale → rint (half-even on the
    double) → unscale.  Needed because pandas goldens were produced this
    way (olap_analysis.py:43,51)."""
    c = F.col(col) if isinstance(col, str) else col
    if digits == 0:
        return F.rint(c)
    scale = F.lit(float(10**digits))
    return F.rint(c * scale) / scale


def with_time_dims(df: DataFrame, date_col: str = "Date") -> DataFrame:
    """Year / Month / Quarter / YearMonth (olap_analysis.py:32-35)."""
    d = F.col(date_col)
    return df.withColumns(
        {
            "Year": F.year(d),
            "Month": F.month(d),
            "Quarter": F.quarter(d),
            "YearMonth": F.date_format(d, "yyyy-MM"),
        }
    )
