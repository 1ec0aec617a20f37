"""Mining-analog queries on the driver tables (M1–M4 classes).

The full multi-feature regressions and clustering are golden-tested on
the stock data (operators/stock_mining.py); here the same operator
classes run on driver tables so the correctness gate covers them:
single-regressor OLS from exact moments (oracle-exact), plus the
pyspark.ml paths as rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .exact import dsum, sql_dsum
from ..operators.localrel import literal_df
from .registry import register


@register(
    "mining_ols_trend",
    tags=("mining", "regression", "agg"),
    oracle=f"""
WITH m AS (
  SELECT event_type,
    COUNT(*)::DOUBLE AS n,
    {sql_dsum("(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0")} AS sx,
    {sql_dsum('value')} AS sy,
    {sql_dsum("((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0) * ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0)")} AS sxx,
    {sql_dsum("((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 3600000000.0) * value")} AS sxy,
    {sql_dsum('value * value')} AS syy
  FROM events GROUP BY event_type
)
SELECT event_type,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m
ORDER BY event_type
""",
)
def mining_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M3 analog — closed-form OLS (value ~ event-time in hours) per
    event_type from exact decimal moments: slope, intercept, in-sample
    R² (squared Pearson corr).  All distributed partial+final aggs —
    the regression itself is just arithmetic on six moments.

    x is hours since 2024-01-01, NOT since the Unix epoch: at epoch
    magnitude, x² ≈ 2.2e11 has a double ulp (3e-5) larger than the
    decimal scale boundary (1e-6), re-opening the shortest-repr vs
    exact-binary cast divergence plans/exact.py exists to avoid (found
    by the sf0.1 oracle sweep — sf0.01 passed by luck)."""
    e = load_table(spark, sf_dir, "events")
    origin_us = 1_704_067_200_000_000  # epoch_us(2024-01-01T00:00Z)
    x = (F.unix_micros(F.col("ts").cast("timestamp")) - origin_us) / 3_600_000_000.0
    df = e.select("event_type", x.alias("x"), F.col("value").alias("y"))
    m = df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


@register(
    "mining_linreg_ml",
    tags=("mining", "regression", "ml"),
    oracle=None,  # pyspark.ml iterative fit — rows-only check
)
def mining_linreg_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2 scale path — ``pyspark.ml.regression.LinearRegression``
    (distributed WLS/l-bfgs) on lineitem: extendedprice ~ quantity +
    discount.  Coefficients are solver-dependent → rows-only."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    data = VectorAssembler(
        inputCols=["l_quantity", "l_discount"], outputCol="features"
    ).transform(l)
    model = LinearRegression(
        featuresCol="features", labelCol="l_extendedprice", regParam=0.0
    ).fit(data)
    s = model.summary
    return literal_df(
        spark,
        [
            (
                float(model.intercept),
                float(model.coefficients[0]),
                float(model.coefficients[1]),
                float(s.r2),
                float(s.meanSquaredError),
            )
        ],
        "intercept double, coef_quantity double, coef_discount double, r2 double, mse double",
    )


@register(
    "mining_kmeans_users",
    tags=("mining", "clustering", "ml"),
    oracle=None,  # cluster labels are implementation-specific — rows-only
)
def mining_kmeans_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 scale path — per-user activity features (avg value, event
    count, distinct types) → standardize → KMeans(k=4, seed=42).
    Output is (cluster, n_users, avg feature centroid) — stable shape
    even though label ids aren't portable (rows-only; co-membership
    parity with the reference clustering is pinned by
    tests/test_stock_mining_golden.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    e = load_table(spark, sf_dir, "events")
    feats = e.groupBy("user_id").agg(
        F.avg("value").alias("avg_value"),
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.count_distinct("event_type").cast("double").alias("n_types"),
    )
    assembled = VectorAssembler(
        inputCols=["avg_value", "n_events", "n_types"], outputCol="_raw"
    ).transform(feats)
    scaled = (
        StandardScaler(inputCol="_raw", outputCol="_f", withMean=True, withStd=True)
        .fit(assembled)
        .transform(assembled)
    )
    pred = (
        KMeans(k=4, seed=42, featuresCol="_f", predictionCol="cluster")
        .fit(scaled)
        .transform(scaled)
    )
    return (
        pred.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("avg_value"), 4).alias("centroid_avg_value"),
            F.round(F.avg("n_events"), 4).alias("centroid_n_events"),
        )
        .orderBy("cluster")
    )


@register(
    "multimodal_blob_stats",
    tags=("llm", "multimodal", "binary"),
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY doc_id
""",
)
def multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → utf-8 payload blob + metadata
    struct (operators/multimodal.py), then pure-expression stats on the
    bytes.  md5 over the blob equals md5 over the utf-8 string in both
    engines."""
    from ..operators.multimodal import attach_blob

    d = load_table(spark, sf_dir, "documents")
    blobs = attach_blob(d)
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("doc_id")


@register(
    "multimodal_decode_stats",
    tags=("llm", "multimodal", "binary", "decode"),
    oracle="""
WITH src AS (
  SELECT doc_id, text,
         CAST(4 + doc_id % 5 AS INT) AS w,
         CAST(3 + doc_id % 4 AS INT) AS h
  FROM documents WHERE length(text) > 0
),
px AS (
  SELECT doc_id, w, h, w * h AS npx,
         substr(repeat(text, CAST(CEIL(3.0 * w * h / length(text)) AS INT)),
                1, 3 * w * h) AS buf
  FROM src
)
SELECT doc_id, 'ppm' AS format, w AS width, h AS height,
       CAST(npx AS BIGINT) AS n_pixels,
       CAST(list_sum(list_transform(generate_series(0, npx - 1),
                     i -> ascii(substr(buf, 3 * i + 1, 1)))) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(generate_series(0, npx - 1),
                     i -> ascii(substr(buf, 3 * i + 2, 1)))) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(generate_series(0, npx - 1),
                     i -> ascii(substr(buf, 3 * i + 3, 1)))) AS BIGINT) AS sum_b
FROM px
ORDER BY doc_id
""",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end-to-end: synthesize binary P6 PPM blobs
    from the corpus with pure column expressions (encode_ppm — header +
    raw RGB triplets, dimensions derived from doc_id), then DECODE them
    with the pure-Python/numpy codec in an Arrow mapInPandas stage
    (operators/multimodal.py: magic-byte parse, header scan, pixel-
    buffer channel sums).  The oracle recomputes every statistic from
    the construction *without* going through the codec, so a decoder
    bug — header arithmetic, channel order, row layout — breaks the
    hash compare.  Integer channel sums keep the compare exact.  At
    100 TB: encode and decode are both map-only stages; the only
    shuffle would be a downstream aggregate."""
    from ..operators.multimodal import decode_image, encode_ppm

    d = load_table(spark, sf_dir, "documents")
    return decode_image(encode_ppm(d)).orderBy("doc_id")
