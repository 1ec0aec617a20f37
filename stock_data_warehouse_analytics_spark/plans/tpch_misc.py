"""Final capability batch: semi-structured JSON columns, correlated
subqueries (Catalyst decorrelation), ntile bucketing, string-pattern
predicates, date arithmetic — each oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import exact_ntile
from ..sources.tables import load_table, register_views
from .exact import davg, sql_davg
from .registry import register


@register(
    "events_json_extract",
    tags=("json", "semi-structured", "agg"),
    oracle="""
SELECT
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
  COUNT(*) AS n,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY 1
ORDER BY 1
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract a field from the JSON
    ``props`` string (``get_json_object`` — JVM-side JSON path, no UDF)
    and aggregate on it.  At scale, prefer parsing once via
    ``from_json`` with an explicit schema into a struct column."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


_CORR_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_whales,
       ROUND({sql_davg('c_acctbal')}, 2) AS avg_bal
FROM customer c
WHERE c_acctbal > (
  SELECT 0.02 * MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register(
    "sql_correlated_subquery",
    tags=("sql-api", "subquery", "decorrelation"),
    oracle=_CORR_SQL,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through ``spark.sql`` — Catalyst
    decorrelates it into an aggregate + join (no per-row re-execution,
    the property that makes it runnable over a 100 TB fact)."""
    register_views(spark, sf_dir)
    return spark.sql(_CORR_SQL)


@register(
    "win_ntile_deciles",
    tags=("window", "ntile"),
    oracle="""
SELECT decile,
       COUNT(*) AS n,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
ORDER BY decile
""",
)
def win_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (the ranking-family member SURVEY §2.6 notes as
    absent from the reference), with a unique tiebreak so bucket edges
    are deterministic.

    Computed via :func:`operators.ranking.exact_ntile` — range-bucketed
    exact global rank + the NTILE formula — instead of
    ``F.ntile().over(Window.orderBy(...))``, whose single-partition
    sort is the plan shape that dies first at 100 TB.  Output is
    bit-identical to the window-function formulation (the oracle below
    IS that formulation)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        exact_ntile(
            o.select("o_totalprice", "o_orderkey"),
            ["o_totalprice", "o_orderkey"],
            n_tiles=10,
            tile_col="decile",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("decile")
    )


@register(
    "filter_string_patterns",
    tags=("filter", "string", "agg"),
    oracle=f"""
SELECT p_type,
       COUNT(*) AS n_widgets,
       ROUND({sql_davg('p_retailprice')}, 2) AS avg_price
FROM part
WHERE p_name LIKE '%widget%'
  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND regexp_matches(p_name, '^(red|blue|green)')
GROUP BY p_type
ORDER BY p_type
""",
)
def filter_string_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-predicate family in one plan: LIKE, IN-list, anchored
    regexp — all pushed/codegen'd JVM-side."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%widget%")
            & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & F.col("p_name").rlike("^(red|blue|green)")
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_widgets"),
            F.round(davg("p_retailprice"), 2).alias("avg_price"),
        )
        .orderBy("p_type")
    )


@register(
    "orders_fulfillment_lag",
    tags=("join", "date-arith", "agg"),
    oracle="""
SELECT o_orderpriority,
       ROUND(SUM(date_diff('day', o_orderdate, l_shipdate))::DOUBLE / COUNT(*), 4) AS avg_lag_days,
       MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_lag_days
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across a fact-fact join: ship lag in days per
    priority.  datediff on day-granular values is exact integer math —
    the sum/count division is the only float op (deterministic)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select("o_orderpriority", lag.alias("lag"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("lag").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_lag_days"
            ),
            F.max("lag").alias("max_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "udaf_median_quantity",
    tags=("agg", "udaf", "pandas-udf"),
    oracle="""
SELECT l_returnflag,
       median(l_quantity) AS med_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def udaf_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a grouped-agg pandas UDF — the UDAF
    extension surface (SURVEY.md §2.11: Spark's pandas_udf grouped-agg
    covers the category).  Median of l_quantity per returnflag:
    l_quantity is integral-valued, so pandas' mean-of-two-middles and
    DuckDB's quantile_cont(0.5) agree bit-for-bit (halves are exact in
    double) — a UDAF that stays oracle-exact without decimal games.
    Arrow-batched per group; at scale each group aggregates on one
    executor (fine for bounded group counts; unbounded-cardinality
    medians would use approx_percentile instead)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit GROUPED_AGG: `from __future__ import annotations` makes
    # the Series->float type hints unresolvable strings for pyspark's
    # signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return float(v.median())

    # Spark disallows mixing pandas and built-in aggregates in one agg,
    # so the row count is a pandas UDAF too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(v):
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            median_udaf("l_quantity").alias("med_qty"),
            count_udaf("l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_variant_extract",
    tags=("json", "variant", "semi-structured"),
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type:
    ``parse_json`` once into a variant value, ``variant_get`` typed
    paths after — the open-schema path that (unlike ``from_json``)
    needs no declared struct and (unlike per-access
    ``get_json_object``) parses each document once.  Integer SUM stays
    in exact int64 on both engines."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
