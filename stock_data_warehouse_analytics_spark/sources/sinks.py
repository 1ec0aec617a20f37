"""Warehouse sinks S4–S6 (SURVEY.md §2.1).

``write_csv_single`` lives in stock_csv.py (bounded result tables).
Here: the partitioned-parquet fact sink (the 100 TB path the reference's
All.csv stands in for) and the JDBC warehouse sink the reference
designed but left commented out (preprocess_stocks.py:221-225).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_fact_parquet", "write_jdbc_fact"]


def write_fact_parquet(
    fact: DataFrame, path: str, *, partition_col: str = "Ticker"
) -> None:
    """The scalable fact sink: parquet partitioned by the grouping key
    every downstream query partitions on (SURVEY.md §1.4).  Partition
    pruning then makes per-ticker reads O(partition), and co-partitioned
    window work needs no extra shuffle after the scan."""
    fact.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def write_jdbc_fact(
    fact: DataFrame,
    url: str,
    table: str = "stock_fact",
    *,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """S6 — JDBC warehouse sink: the Spark form of the reference's
    ``big.to_sql('stock_fact', engine, if_exists='replace')``
    (preprocess_stocks.py:221-225, conn str :14).  ``mode='overwrite'``
    ≙ ``if_exists='replace'``.  Executor-parallel inserts, batched;
    no driver-side row loop.  (No database ships in this container —
    exercised only when a URL is supplied.)"""
    writer = fact.write.mode(mode).option("batchsize", str(batchsize))
    writer.jdbc(url, table, properties=properties or {})
