"""Sparse retrieval depth: BM25 top-k — the production lexical scorer.

The retrieval family already covers TF-IDF (``sql_api.py``), sparse
shingle-cosine (``chunking.py``), dense ANN (``operators/similarity``),
and RRF hybrid fusion (``stat_models2.py``); this adds the scorer that
actually ranks results in Lucene/Elasticsearch — Okapi BM25 with the
Lucene idf formulation ln(1 + (N − df + 0.5)/(df + 0.5)), k1 = 1.2,
b = 0.75.

Cross-engine exactness: per-row LN on identical double inputs is
bit-stable across engines (proven by ``text_tfidf_topterms``); each
per-(doc, term) score is ONE identically-ordered double expression,
then quantized to integer NANO-units before the per-doc sum so the
aggregation is order-independent (the ``plans/exact.py`` stance applied
to a 3-term sum); the final top-k cut orders by the integer score with
a doc_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table
from .registry import register

_SQL_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"

# mid-frequency corpus terms — fixed probe query, identical literals in
# both engines
_QUERY_TERMS = ("spark", "window", "merge")
_K1, _B = 1.2, 0.75


@register(
    "text_bm25_topk",
    tags=("llm", "text", "retrieval", "bm25"),
    oracle=f"""
WITH dlen AS (
  SELECT doc_id, len({_SQL_TOKENS}) AS dl FROM documents
),
scal AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dlen
),
tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ('spark', 'window', 'merge')
  GROUP BY doc_id, term
),
dfs AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN(1.0e0 + (scal.n_docs - dfs.df + 0.5e0) / (dfs.df + 0.5e0))
           * (CAST(tf.tf AS DOUBLE) * 2.2e0)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2e0 * (0.25e0 + 0.75e0 * (dlen.dl / scal.avgdl)))
           * 1000000000, 0) AS BIGINT) AS score_nano
  FROM tf
  JOIN dlen ON tf.doc_id = dlen.doc_id
  JOIN dfs ON tf.term = dfs.term
  CROSS JOIN scal
)
SELECT doc_id,
       COUNT(*) AS n_terms_matched,
       ROUND(CAST(SUM(score_nano) AS DOUBLE) / 1000000000, 6) AS bm25
FROM scored
GROUP BY doc_id
ORDER BY SUM(score_nano) DESC, doc_id
LIMIT 20
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OKAPI BM25 top-20 for a fixed 3-term query — the
    Lucene/Elasticsearch lexical ranking function (idf·tf saturation
    with k1 = 1.2 and length normalization b = 0.75 against the corpus
    average document length).

    Scale shape: tokens are filtered to the 3 query terms BEFORE the
    (doc, term) shuffle, so the tf table is hit-sized, not corpus-sized;
    df (3 rows) and the (N, avgdl) scalar broadcast; the per-doc length
    table is the only corpus-grain join side and it is map-only derived
    from the scan; top-k is a TakeOrderedAndProject on the integer
    nano-score with doc_id tiebreak — no global sort materializes."""
    docs = load_table(spark, sf_dir, "documents")
    dlen = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("dl")
    )
    scal = dlen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = (
        tok.filter(F.col("term").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    score = (
        idf
        * (tf_d * F.lit(_K1 + 1.0))
        / (
            tf_d
            + F.lit(_K1)
            * (
                F.lit(1.0 - _B)
                + F.lit(_B) * (F.col("dl") / F.col("avgdl"))
            )
        )
    )
    scored = (
        tf.join(dlen, "doc_id")
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(scal))
        .select(
            "doc_id",
            F.round(score * 1000000000, 0)
            .cast("bigint")
            .alias("score_nano"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("score_nano").alias("nano"),
        )
        .orderBy(F.desc("nano"), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("nano").cast("double") / 1000000000, 6).alias(
                "bm25"
            ),
        )
    )
