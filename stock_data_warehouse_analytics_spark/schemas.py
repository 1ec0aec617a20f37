"""Schemas and column maps for the stock fact table (SURVEY.md §1).

Mirrors the reference's implicit schema contract:
- raw CSVs: Vietnamese quoted headers, UTF-8 BOM, newest-first rows
  (``/root/reference/stock_data/HVN.csv:1``),
- rename map COL_MAP (``/root/reference/preprocess_stocks.py:86-99``),
- cleaned fact columns + derivations
  (``/root/reference/preprocess_stocks.py:138,165-176``).
"""

from __future__ import annotations

from pyspark.sql import types as T

TICKERS = ["HVN", "AST", "NCT", "SCS", "VJC", "VTR"]

# Vietnamese → English header map (preprocess_stocks.py:86-99).  Keys are
# matched after stripping whitespace/newlines and the UTF-8 BOM.
COL_MAP = {
    "Ngày": "Date",
    "Date": "Date",
    "Lần cuối": "Close",
    "Close": "Close",
    "Mở": "Open",
    "Cao": "High",
    "Thấp": "Low",
    "KL": "Volume",
    "Volume": "Volume",
    "% Thay đổi": "ChangePercent",
    "Change%": "ChangePercent",
    "% Change": "ChangePercent",
}

# Cleaned fact schema (cleaned/All.csv:1; SURVEY.md §1.2).
FACT_SCHEMA = T.StructType(
    [
        T.StructField("Date", T.DateType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Volume", T.LongType()),
        T.StructField("ChangePercent", T.DoubleType()),
        T.StructField("Ticker", T.StringType()),
        T.StructField("Return", T.DoubleType()),
        T.StructField("Average", T.DoubleType()),
        T.StructField("Volatility", T.DoubleType()),
        T.StructField("LogReturn", T.DoubleType()),
    ]
)

FACT_COLUMNS = [f.name for f in FACT_SCHEMA.fields]
