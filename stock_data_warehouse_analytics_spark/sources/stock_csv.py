"""Stock CSV ingestion S1–S4 (SURVEY.md §2.1) — the reference's ETL
(``preprocess_stocks.py:121-230``) as one lazy, codegen'd Spark plan.

Design for scale: a SINGLE multi-file scan with ticker extraction from
``input_file_name()`` replaces the reference's per-ticker Python loop —
one job regardless of file count, parallel across executors.  The
per-ticker API (:func:`clean_file`) still exists for CLI parity.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.derivations import (
    average_price,
    log_return,
    return_pct,
    volatility,
)
from ..functions.parsers import parse_date, parse_number, parse_percent, parse_volume
from ..schemas import COL_MAP, FACT_COLUMNS, TICKERS

__all__ = [
    "standardize_columns",
    "read_raw",
    "clean_raw",
    "load_stock_facts",
    "load_cleaned",
    "write_csv_single",
]


def standardize_columns(df: DataFrame) -> DataFrame:
    """P1 — header normalization (preprocess_stocks.py:102-118): strip
    whitespace/newlines/BOM, map Vietnamese→English via COL_MAP, pass
    unknown columns through stripped."""
    renames = {}
    for c in df.columns:
        stripped = c.replace("﻿", "").replace("\n", " ").strip()
        renames[c] = COL_MAP.get(stripped, stripped)
    return df.withColumnsRenamed(renames)


def read_raw(
    spark: SparkSession, path: str, *, encoding: str = "UTF-8"
) -> DataFrame:
    """S1+S2 — raw CSV scan (preprocess_stocks.py:124-127).  ``path``
    may be a file, directory, or glob.  The reference's latin1 retry
    maps to calling again with ``encoding='ISO-8859-1'``."""
    return (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", True)
        .csv(path)
    )


def clean_raw(raw: DataFrame, ticker: F.Column | str | None = None) -> DataFrame:
    """ETL core (preprocess_stocks.py:121-186): standardize headers →
    attach Ticker → parse all columns (pure expressions, no UDFs) →
    derive Return/Average/Volatility/LogReturn → canonical order.

    ``ticker``: a literal string (reference's per-file mode, :200), a
    Column (scalable ``input_file_name`` mode), or None to derive from
    the filename like preprocess_stocks.py:131-136.
    """
    df = standardize_columns(raw)
    if ticker is None:
        ticker = F.upper(
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.[Cc][Ss][Vv]$", 1)
        )
    elif isinstance(ticker, str):
        ticker = F.lit(ticker)

    df = df.withColumn("Ticker", ticker)
    df = df.withColumns(
        {
            "Date": parse_date(F.col("Date")),
            "Close": parse_number(F.col("Close")),
            "Open": parse_number(F.col("Open")),
            "High": parse_number(F.col("High")),
            "Low": parse_number(F.col("Low")),
            "Volume": parse_volume(F.col("Volume"))
            if "Volume" in df.columns
            else F.lit(None).cast("long"),
            "ChangePercent": parse_percent(F.col("ChangePercent"))
            if "ChangePercent" in df.columns
            else F.lit(None).cast("double"),
        }
    )
    df = df.withColumns(
        {
            "Return": return_pct(F.col("Close"), F.col("Open")),
            "Average": average_price(F.col("High"), F.col("Low")),
            "Volatility": volatility(F.col("High"), F.col("Low")),
            "LogReturn": log_return(F.col("Close"), F.col("Open")),
        }
    )
    extra = [c for c in df.columns if c not in FACT_COLUMNS]
    return df.select(*FACT_COLUMNS, *extra).orderBy("Date")


def load_stock_facts(
    spark: SparkSession,
    input_dir: str,
    tickers: list[str] | None = None,
) -> DataFrame:
    """process_all equivalent (preprocess_stocks.py:189-230): per-ticker
    glob ``*{T}*.csv`` with all-CSV fallback, cleaned and union'd into
    the merged fact table (U1, ``pd.concat sort=False`` ≙ unionByName).

    Each ticker's files form one lazy branch of a union plan — no
    driver-side data movement; at scale this is a single multi-source
    scan feeding one write.
    """
    import glob as _glob

    tickers = tickers or TICKERS
    branches = []
    for t in tickers:
        files = sorted(_glob.glob(os.path.join(input_dir, f"*{t}*.csv")))
        if not files:
            continue
        branches.append(clean_raw(read_raw(spark, files), ticker=t))
    if not branches:
        branches = [clean_raw(read_raw(spark, os.path.join(input_dir, "*.csv")))]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), branches
    )


def load_cleaned(spark: SparkSession, path: str) -> DataFrame:
    """S3 — typed scan of already-cleaned CSVs (the ``pd.read_csv(
    'cleaned/All.csv', parse_dates=['Date'])`` entry point used by every
    downstream reference script, e.g. olap_analysis.py:29).  Explicit
    FACT_SCHEMA: no inference pass over the data, stable types."""
    from ..schemas import FACT_SCHEMA

    return (
        spark.read.schema(FACT_SCHEMA)
        .option("header", True)
        .csv(path)
    )


def write_csv_single(df: DataFrame, out_path: str) -> None:
    """S4 — single-file CSV sink with header, no index column
    (``df.to_csv(path, index=False)``, preprocess_stocks.py:183-184).
    coalesce(1) is deliberate: these sinks are bounded result tables;
    large fact writes should use partitioned parquet instead."""
    tmp = out_path + "._spark_tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.startswith("part-") and f.endswith(".csv")
    )
    os.replace(os.path.join(tmp, part), out_path)
    import shutil

    shutil.rmtree(tmp)
