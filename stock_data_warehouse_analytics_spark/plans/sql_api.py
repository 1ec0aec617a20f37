"""Queries exercising the ``spark.sql`` surface and relational TF-IDF.

The engine's SQL entry point: testdata tables registered as temp views
(``sources.tables.register_views``), query written in SQL — Catalyst
compiles it to the same physical plan the DataFrame API would get.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table, register_views
from .exact import sql_dsum
from .registry import register

# Q6-shaped: the same SQL text runs on both engines (modulo the
# timestamp literal spelling), so the oracle is nearly verbatim.
_Q6_BODY = f"""
SELECT
  {sql_dsum('l_extendedprice * l_discount')} AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register(
    "sql_q6_forecast_revenue",
    tags=("sql-api", "agg", "filter"),
    oracle=_Q6_BODY,
)
def sql_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape submitted through ``spark.sql`` on registered
    views — identical SQL text on both engines; Catalyst still pushes
    the three filters into the parquet scan."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_BODY)


@register(
    "text_tfidf_topterms",
    tags=("llm", "text", "tfidf"),
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.term,
         tf.tf * (LN((n.n_docs + 1.0) / (df.df + 1)) + 1) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT term, ROUND({sql_dsum('tfidf')}, 6) AS total_tfidf
FROM scored
GROUP BY term
ORDER BY total_tfidf DESC, term
LIMIT 10
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational TF-IDF (explicit vocabulary): corpus top-10 terms by
    summed tf·idf with smooth idf = ln((N+1)/(df+1))+1.  The hashed
    ``pyspark.ml`` variant (no vocabulary state) is
    ``operators/text_ml.tfidf_features`` — exercised in tests; hashing
    is engine-specific so this explicit form carries the oracle."""
    from ..functions.text import tokens
    from ..sources.tables import load_table
    from .exact import dsum

    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = docs.count()
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = df_.withColumn(
        "idf", F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1)) + 1
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )
    return (
        scored.groupBy("term")
        .agg(F.round(dsum("tfidf"), 6).alias("total_tfidf"))
        .orderBy(F.desc("total_tfidf"), "term")
        .limit(10)
    )


# identical text on both engines: GROUPING SETS with GROUPING() flags
# to disambiguate the NULLs that mark super-aggregate rows
_GSETS_BODY = """
SELECT o_orderpriority,
       o_orderstatus,
       GROUPING(o_orderpriority) AS g_pri,
       GROUPING(o_orderstatus) AS g_st,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus
"""


@register(
    "sql_grouping_sets",
    tags=("sql-api", "agg", "grouping-sets"),
    oracle=_GSETS_BODY,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup,
    both covered elsewhere): four chosen aggregation granularities in
    ONE pass — Spark expands the sets and aggregates behind a single
    shuffle, the same plan shape cube/rollup lower to.  GROUPING()
    flags distinguish 'NULL because super-aggregate' from data NULLs.
    SQL text is engine-identical, so the oracle is verbatim."""
    register_views(spark, sf_dir)
    return spark.sql(_GSETS_BODY)


@register(
    "sql_scalar_udf",
    tags=("sql-api", "sql-udf", "function"),
    oracle=f"""
SELECT l_returnflag,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS charged,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (CREATE FUNCTION ... RETURN expr — Spark 4's
    catalog-resident function surface): the charge formula defined once
    as a SQL function and reused.  Catalyst INLINES the body into the
    plan (the optimized plan is identical to writing the expression by
    hand — assert-able via explain), so unlike Python UDxFs this
    extension mechanism costs nothing at any scale.  The oracle writes
    the same expression inline."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge(p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS DOUBLE RETURN p * (1 - d) * (1 + t)
        """
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               {sql_dsum('charge(l_extendedprice, l_discount, l_tax)')} AS charged,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "source_python_datasource",
    tags=("source", "python-datasource", "agg"),
    oracle=f"""
SELECT i % 10 AS bucket,
       COUNT(*) AS n,
       {sql_dsum(f'((i * 2654435761) % 2147483648) / 2147483648.0')} AS sum_x,
       MIN((i * 2654435761) % 2147483648) AS min_mix,
       MAX((i * 2654435761) % 2147483648) AS max_mix
FROM generate_series(0, 9999) t(i)
GROUP BY bucket
ORDER BY bucket
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through a custom Python DataSource
    (``sources/pydatasource.py`` — Spark 4's connector extension API)
    and aggregate: the source plans 8 range partitions driver-side and
    executors iterate rows in parallel (Arrow-batched).  Rows are a
    deterministic hash-mix of the index, so DuckDB regenerates the
    identical table from ``generate_series`` and the comparison is
    exact — proving the custom source delivers precisely the declared
    rows, partitioned as promised."""
    from pyspark.sql import functions as F

    from ..sources.pydatasource import (
        SyntheticNumbersDataSource,
        ensure_package_shipped,
    )
    from .exact import dsum

    # workers unpickle the source by module reference — ship the package
    ensure_package_shipped(spark)
    try:
        spark.dataSource.register(SyntheticNumbersDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("synthetic_numbers")
        .option("rows", 10_000)
        .option("partitions", 8)
        .load()
    )
    mixed = (F.col("i") * 2654435761) % 2147483648
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("x").alias("sum_x"),
            F.min(mixed).alias("min_mix"),
            F.max(mixed).alias("max_mix"),
        )
        .orderBy("bucket")
    )


@register(
    "sql_udtf_polymorphic",
    tags=("sql", "udtf", "polymorphic", "analyze"),
    oracle="""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       toks[1] AS tok1, toks[2] AS tok2, toks[3] AS tok3,
       CAST(len(toks) AS BIGINT) AS n_tokens
FROM t
ORDER BY doc_id
""",
)
def sql_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF — the Spark 4 table-function surface
    where ``analyze()`` computes the OUTPUT SCHEMA from the call's
    literal arguments at plan time: ``lead_tokens(text, k)`` returns k
    token columns (tok1…tokk) plus a count, so the same function serves
    any width without code changes (the static-schema cousin is
    text_sentences_udtf).  The UDTF itself is deterministic whitespace
    tokenization, so the LATERAL result is oracle-exact.  Arrow-batched
    like every Python UDTF; per-row fan-out stays map-side."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    class LeadTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            fields = [
                StructField(f"tok{i + 1}", StringType()) for i in range(n)
            ] + [StructField("n_tokens", LongType())]
            return AnalyzeResult(StructType(fields))

        def eval(self, text: str, k: int):
            toks = [t for t in (text or "").strip().lower().split() if t]
            lead = [toks[i] if i < len(toks) else None for i in range(int(k))]
            yield (*lead, len(toks))

    spark.udtf.register("lead_tokens", udtf(LeadTokens))
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_poly")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok1, t.tok2, t.tok3, t.n_tokens
        FROM _docs_poly d, LATERAL lead_tokens(d.text, 3) t
        ORDER BY d.doc_id
        """
    )
