"""Deterministic sampling / splitting over ``documents`` — the
training-data-pipeline staples the reference never needed at 2,585 rows
but any 100 TB corpus job starts with.

Seeded RNG sampling (``df.sample``) is engine-specific, so these use
content-hash bucketing instead: a row is in the sample iff
``hash_int60(key) % D < k``.  That makes the selection (a) exactly
reproducible on any engine that can compute md5 — the DuckDB oracles
mirror it bit-for-bit — and (b) stable under re-runs, repartitioning,
and incremental arrival of new data (a row's fate never depends on what
other rows exist — the property that matters when the corpus grows
between pipeline runs).  All map-side expressions: no shuffle except
the final small aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_int60
from ..sources.tables import load_table
from .registry import register

# DuckDB mirror of operators.dedup.hash_int60
_SQL_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "sample_stratified_hash",
    tags=("llm", "sampling", "deterministic"),
    oracle=f"""
WITH hashed AS (
  SELECT source, lang, {_SQL_H60.format(x="doc_id::VARCHAR || ':' || text")} % 100 AS bucket
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE bucket < 10) AS n_sampled
FROM hashed
GROUP BY source, lang
ORDER BY source, lang
""",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% stratified sample: membership decided by
    content hash mod 100, reported per (source, lang) stratum.  Unlike
    seeded ``df.sample`` this is reproducible across engines/partitions
    and stable as the corpus grows — the standard trick for carving
    eval sets out of a moving training corpus."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_int60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    ) % 100
    return (
        d.withColumn("bucket", bucket)
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("bucket") < 10, 1)).alias("n_sampled"),
        )
        .orderBy("source", "lang")
    )


@register(
    "split_train_val_test",
    tags=("llm", "sampling", "split"),
    oracle=f"""
WITH hashed AS (
  SELECT source, {_SQL_H60.format(x="doc_id::VARCHAR || ':' || text")} % 100 AS bucket
  FROM documents
)
SELECT source,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM hashed
GROUP BY source, split
ORDER BY source, split
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content hash,
    counted per source.  A document lands in the same split on every
    engine, every run, and after any upstream repartition — leakage-free
    by construction (membership is a pure function of the row)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_int60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
    ) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )
