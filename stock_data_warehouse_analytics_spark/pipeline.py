"""End-to-end pipeline runner — the drop-in replacement for the
reference's three scripts:

- ``run_etl``    ≙ ``python preprocess_stocks.py`` (cleaned/{T}.csv + All.csv)
- ``run_olap``   ≙ ``python olap_analysis.py`` result tables (olap_results/01–04)
- ``run_mining`` ≙ ``python datamining_analysis.py`` (datamining_results/01–04)

Chart rendering (matplotlib/plotly PNGs) is presentation, not engine
(SURVEY.md §2.1 S8) — the result *tables* are the contract, and every
one matches the reference's committed goldens (tests/test_pipeline_cli.py).

CLI:  python -m stock_data_warehouse_analytics_spark all \\
          --input /root/reference/stock_data --output /tmp/out
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TICKERS
from .sources.stock_csv import load_stock_facts, write_csv_single

__all__ = ["run_etl", "run_olap", "run_mining", "main"]


def run_etl(
    spark: SparkSession, input_dir: str, output_dir: str
) -> DataFrame:
    """ETL: raw CSVs → cleaned per-ticker CSVs + merged All.csv
    (preprocess_stocks.py:189-230).  Returns the merged fact DataFrame
    (cached — the one bounded intermediate every stage reuses)."""
    os.makedirs(output_dir, exist_ok=True)
    fact = load_stock_facts(spark, input_dir).cache()
    for t in TICKERS:
        per = fact.filter(fact.Ticker == t).orderBy("Date")
        if per.limit(1).count():
            write_csv_single(per, os.path.join(output_dir, f"{t}.csv"))
    write_csv_single(fact.orderBy("Ticker", "Date"), os.path.join(output_dir, "All.csv"))
    return fact


def run_olap(spark: SparkSession, fact: DataFrame, results_dir: str) -> None:
    """OLAP result tables 01–04 (olap_analysis.py:43-63)."""
    from .operators.stock_olap import (
        monthly_volume,
        prepare_olap_frame,
        quarterly_price,
        stats_panel,
        yearly_growth,
    )

    os.makedirs(results_dir, exist_ok=True)
    df = prepare_olap_frame(fact)
    write_csv_single(
        quarterly_price(df), os.path.join(results_dir, "01_quarterly_price.csv")
    )
    write_csv_single(
        yearly_growth(df), os.path.join(results_dir, "02_growth_24_25.csv")
    )
    write_csv_single(
        monthly_volume(df), os.path.join(results_dir, "03_monthly_volume.csv")
    )
    write_csv_single(stats_panel(df), os.path.join(results_dir, "04_stats_2025.csv"))


def run_mining(spark: SparkSession, fact: DataFrame, results_dir: str) -> None:
    """Mining result tables 01–04 (datamining_analysis.py)."""
    from .operators.stock_mining import (
        kmeans_exact_small,
        kmeans_features,
        prepare_mining_frame,
        regression_next_day,
        regression_same_day,
        zscore_anomalies,
    )

    os.makedirs(results_dir, exist_ok=True)
    df = prepare_mining_frame(fact)
    write_csv_single(
        regression_same_day(df),
        os.path.join(results_dir, "01_regression_same_day.csv"),
    )
    write_csv_single(
        regression_next_day(df),
        os.path.join(results_dir, "02_regression_next_day.csv"),
    )
    write_csv_single(
        kmeans_exact_small(kmeans_features(df), k=3),
        os.path.join(results_dir, "03_kmeans_clusters.csv"),
    )
    write_csv_single(
        zscore_anomalies(df), os.path.join(results_dir, "04_anomalies.csv")
    )


def main(argv: list[str] | None = None) -> None:
    import argparse

    from .session import get_spark

    p = argparse.ArgumentParser(prog="stock_data_warehouse_analytics_spark")
    p.add_argument("stage", choices=["etl", "olap", "mining", "all"])
    p.add_argument("--input", required=True, help="raw stock_data dir")
    p.add_argument("--output", required=True, help="output root dir")
    args = p.parse_args(argv)

    spark = get_spark("stock-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    cleaned = os.path.join(args.output, "cleaned")
    fact = run_etl(spark, args.input, cleaned)
    if args.stage in ("olap", "all"):
        run_olap(spark, fact, os.path.join(args.output, "olap_results"))
    if args.stage in ("mining", "all"):
        run_mining(spark, fact, os.path.join(args.output, "datamining_results"))
    spark.stop()


if __name__ == "__main__":
    main()
