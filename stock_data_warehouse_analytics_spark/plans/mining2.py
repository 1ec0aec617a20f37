"""Mining batch 2: market-basket association (the missing classic
analysis family) and out-of-vocabulary rate (the tokenizer-coverage
metric every corpus split should report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_TOPK = 50


@register(
    "mining_basket_lift",
    tags=("mining", "basket", "association", "join"),
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_orders AS (
  SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
pair_counts AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM items a JOIN items b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, support,
       (CAST(n.n_orders AS DOUBLE) * CAST(support AS DOUBLE))
         / (CAST(pa.c AS DOUBLE) * CAST(pb.c AS DOUBLE)) AS lift
FROM pair_counts
JOIN part_orders pa ON pa.l_partkey = part_a
JOIN part_orders pb ON pb.l_partkey = part_b
CROSS JOIN n
ORDER BY support DESC, lift DESC, part_a, part_b
LIMIT {_TOPK}
""",
)
def mining_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: top co-purchased part pairs by
    support, with lift (observed co-occurrence over the independence
    expectation) — the 2-itemset core of apriori.  The pair generation
    is a self-join on the order key, safe at any scale because BASKETS
    ARE BOUNDED (≤ tens of lines per order ⇒ O(k²) pairs per order,
    linear overall) — the canonical example of a self-join that looks
    quadratic but isn't.  Lift divides in one fixed double order;
    top-k is TakeOrdered with a full deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    part_orders = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n_orders = items.select("l_orderkey").distinct().count()
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    pa = part_orders.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    pb = part_orders.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    lift = (F.lit(float(n_orders)) * F.col("support").cast("double")) / (
        F.col("ca").cast("double") * F.col("cb").cast("double")
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .select("part_a", "part_b", "support", lift.alias("lift"))
        .orderBy(F.desc("support"), F.desc("lift"), "part_a", "part_b")
        .limit(_TOPK)
    )


_SQL_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"


@register(
    "text_oov_rate",
    tags=("llm", "text", "vocab", "oov"),
    oracle=f"""
WITH train_vocab AS (
  SELECT DISTINCT unnest({_SQL_TOKENS}) AS term
  FROM documents WHERE doc_id % 2 = 0
),
test_tokens AS (
  SELECT source, unnest({_SQL_TOKENS}) AS term
  FROM documents WHERE doc_id % 2 = 1
),
flagged AS (
  SELECT t.source,
         CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS is_oov
  FROM test_tokens t LEFT JOIN train_vocab v USING (term)
)
SELECT source,
       COUNT(*) AS n_tokens,
       CAST(SUM(is_oov) AS BIGINT) AS n_oov,
       CAST(SUM(is_oov) AS DOUBLE) / COUNT(*) AS oov_rate
FROM flagged
GROUP BY source
ORDER BY source
""",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate: vocabulary built on the even-id half of
    the corpus, token coverage measured on the odd half, per source —
    the held-out check run before freezing a tokenizer (a source with
    high OOV needs vocab budget or normalization work).  Occurrence-
    weighted (every token instance counts, not types).  One distinct
    pass for the vocab, one explode + hash join for the test half —
    both sides shuffle on the term key once."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens

    vocab = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .distinct()
        .withColumn("in_vocab", F.lit(1))
    )
    test = d.filter(F.col("doc_id") % 2 == 1).select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    flagged = test.join(vocab, "term", "left").select(
        "source",
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0).alias("is_oov"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("is_oov").alias("n_oov"),
            (F.sum("is_oov").cast("double") / F.count(F.lit(1))).alias("oov_rate"),
        )
        .orderBy("source")
    )
