"""TF-IDF / n-gram feature pipelines (SURVEY.md §7.6 text-analysis
extension) via ``pyspark.ml.feature`` — the scale path for
vocabulary-free text features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tfidf_features", "top_terms_by_tfidf"]


def tfidf_features(
    docs: DataFrame, *, text_col: str = "text", num_features: int = 1 << 12
) -> DataFrame:
    """Tokenizer → HashingTF → IDF: sparse TF-IDF vectors per document.
    HashingTF needs no vocabulary broadcast (hash-based) — the feature
    extractor that still works at 100 TB."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    toks = Tokenizer(inputCol=text_col, outputCol="_tokens").transform(docs)
    tf = HashingTF(
        inputCol="_tokens", outputCol="_tf", numFeatures=num_features
    ).transform(toks)
    idf_model = IDF(inputCol="_tf", outputCol="tfidf").fit(tf)
    return idf_model.transform(tf).drop("_tokens", "_tf")


def top_terms_by_tfidf(docs: DataFrame, *, k: int = 10, text_col: str = "text") -> DataFrame:
    """Explicit (non-hashed) TF-IDF over the actual vocabulary, fully
    relational: tf from explode+count, df from distinct doc counts, idf
    = ln((N+1)/(df+1))+1, then top-k terms per corpus by summed tf-idf.
    Deterministic arithmetic — unlike HashingTF this is oracle-able."""
    from ..functions.text import tokens

    tok = docs.select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
    n_docs = docs.count()
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = df_.withColumn(
        "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1
    )
    scored = tf.join(F.broadcast(idf), "term").withColumn(
        "tfidf", F.col("tf") * F.col("idf")
    )
    return (
        scored.groupBy("term")
        .agg(F.round(F.sum("tfidf"), 6).alias("total_tfidf"))
        .orderBy(F.desc("total_tfidf"), "term")
        .limit(k)
    )
