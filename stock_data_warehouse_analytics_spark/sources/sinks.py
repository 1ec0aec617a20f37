"""Warehouse sinks S4–S6 (SURVEY.md §2.1).

``write_csv_single`` lives in stock_csv.py (bounded result tables).
Here: the partitioned-parquet fact sink (the 100 TB path the reference's
All.csv stands in for) and the JDBC warehouse sink the reference
designed but left commented out (preprocess_stocks.py:221-225).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_fact_parquet",
    "write_jdbc_fact",
    "write_table",
    "read_table",
    "SUPPORTED_FORMATS",
]


def write_fact_parquet(
    fact: DataFrame, path: str, *, partition_col: str = "Ticker"
) -> None:
    """The scalable fact sink: parquet partitioned by the grouping key
    every downstream query partitions on (SURVEY.md §1.4).  Partition
    pruning then makes per-ticker reads O(partition), and co-partitioned
    window work needs no extra shuffle after the scan."""
    fact.write.mode("overwrite").partitionBy(partition_col).parquet(path)


# Formats built into this Spark distribution.  avro ships as an external
# package (org.apache.spark:spark-avro) — exposed only when importable at
# runtime; callers get a clear error otherwise rather than a Py4J trace.
SUPPORTED_FORMATS = ("parquet", "orc", "csv", "json")


def _writer(df: DataFrame, fmt: str, **options: str):
    if fmt not in SUPPORTED_FORMATS + ("avro",):
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    for k, v in options.items():
        w = w.option(k, v)
    return w


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Format-dispatching sink over Spark's built-in columnar (parquet,
    orc) and text (csv, json) sources.  All four share the same
    partitioned-directory layout, predicate/partition pruning, and
    executor-parallel writes; columnar formats additionally get column
    pruning + min/max skipping, which is why the fact path defaults to
    parquet (see :func:`write_fact_parquet`)."""
    w = _writer(df, fmt, **options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema=None,
    **options: str,
):
    """Counterpart scan.  For text formats pass ``schema`` — type
    inference costs an extra full pass and can drift (csv reads
    everything as string without it); columnar formats carry their own
    schema."""
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", True)
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


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
