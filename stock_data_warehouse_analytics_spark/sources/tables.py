"""Parquet scans for the driver's TPC-H-ish testdata (TESTDATA.md).

Scan-level scale notes (the part that matters at 100 TB):

- Parquet + lazy DataFrames mean Catalyst pushes filters and prunes
  columns into the scan (``PushedFilters`` / ``ReadSchema`` in
  ``.explain``); callers should always ``select`` only what they need
  and filter as early as possible — the plans in ``plans/`` do.
- No caching here: at 100 TB you cannot cache the fact table; every
  query should be a single scan-shaped pipeline.  (The tiny stock fact
  table from the reference IS cached by its pipeline — bounded data.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
