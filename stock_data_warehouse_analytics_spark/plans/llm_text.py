"""Text-analysis queries over ``documents`` (LLM-pipeline surface).

The SQL oracles are generated from the SAME stopword lists / constants
as the Spark expressions in ``functions/text.py`` — one source of truth,
two engines, hash-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_TOKEN_REGEX,
    LANG_STOPWORDS,
    avg_word_len,
    bpe_token_count,
    md5_fingerprint,
    punct_ratio,
    quality_score,
    rolling_hash,
    stopword_ratio,
    token_count,
    tokens,
)
from ..sources.tables import load_table
from .registry import register

_SQL_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"
_SQL_NTOK = f"len({_SQL_TOKENS})"


def _sql_stop_hits(lang: str) -> str:
    rx = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(trim(text)), '{rx}'))"


_SQL_PUNCT = (
    r"((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE"
    r" / length(text))"
)


def _sql_predicted_lang() -> str:
    """Mirror of functions.text.predicted_lang's fold, same lang order."""
    langs = sorted(LANG_STOPWORDS)
    score = {lg: f"({_sql_stop_hits(lg)}::DOUBLE / {_SQL_NTOK})" for lg in langs}
    best, best_score = f"'{langs[0]}'", score[langs[0]]
    for lg in langs[1:]:
        cond = f"({score[lg]} > {best_score})"
        best = f"(CASE WHEN {cond} THEN '{lg}' ELSE {best} END)"
        best_score = f"(CASE WHEN {cond} THEN {score[lg]} ELSE {best_score} END)"
    return best


@register(
    "text_stats",
    tags=("llm", "text", "quality"),
    oracle=f"""
SELECT
  doc_id,
  {_SQL_NTOK} AS n_tokens,
  ROUND(length(regexp_replace(lower(trim(text)), '\\s+', '', 'g'))::DOUBLE / {_SQL_NTOK}, 6) AS avg_word_len,
  ROUND({_SQL_PUNCT}, 6) AS punct_ratio,
  ROUND({_sql_stop_hits('en')}::DOUBLE / {_SQL_NTOK}, 6) AS stopword_ratio,
  ROUND(
    LEAST(1.0, {_SQL_NTOK} / 100.0) * 0.4
    + LEAST(1.0, ({_sql_stop_hits('en')}::DOUBLE / {_SQL_NTOK}) * 5) * 0.3
    + (1.0 - LEAST(1.0, {_SQL_PUNCT} * 10)) * 0.3, 6) AS quality
FROM documents
ORDER BY doc_id
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring per document — pure expressions
    over the scan, no shuffle at all (the 100 TB shape: embarrassingly
    parallel map)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.round(avg_word_len(t), 6).alias("avg_word_len"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
    ).orderBy("doc_id")


@register(
    "text_langid_confusion",
    tags=("llm", "text", "langid"),
    oracle=f"""
SELECT lang, {_sql_predicted_lang()} AS predicted, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword densities, argmax) aggregated as
    a labelled-vs-predicted confusion table."""
    from ..functions.text import with_predicted_lang

    d = load_table(spark, sf_dir, "documents")
    return (
        with_predicted_lang(d.select("lang", "text"), "text", "predicted")
        .select("lang", "predicted")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@register(
    "text_fingerprints",
    tags=("llm", "text", "fingerprint"),
    oracle="""
SELECT
  doc_id,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
  list_reduce(
    list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
    (acc, x) -> (acc * 31 + x) % 2147483647
  ) AS rhash
FROM documents
ORDER BY doc_id
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized md5 + polynomial rolling hash
    (pure integer fold — engine-independent by construction)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        md5_fingerprint(F.col("text")).alias("fingerprint"),
        rolling_hash(F.col("text")).alias("rhash"),
    ).orderBy("doc_id")


@register(
    "text_token_hist",
    tags=("llm", "text", "explode"),
    oracle=f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
)
def text_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram (explode → count → top-k): the shape of
    every vocabulary/BPE-prep job."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


# the regex is shared verbatim with functions.text.BPE_TOKEN_REGEX;
# RE2 (DuckDB) and Java regex (Spark) agree on this lookaround-free,
# leftmost-first pattern, so counts are token-for-token identical
_SQL_BPE = (
    "len(regexp_extract_all(lower(trim(text)), "
    f"'{BPE_TOKEN_REGEX.replace(chr(39), chr(39) * 2)}'))"
)


@register(
    "text_bpe_token_cost",
    tags=("llm", "text", "tokenize"),
    oracle=f"""
SELECT
  doc_id,
  {_SQL_NTOK} AS ws_tokens,
  {_SQL_BPE} AS bpe_tokens,
  ROUND({_SQL_BPE}::DOUBLE / {_SQL_NTOK}, 6) AS bpe_per_word
FROM documents
ORDER BY doc_id
""",
)
def text_bpe_token_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LLM token-cost estimate: whitespace word count vs
    BPE-style pre-token count (GPT-2-ish regex — contraction suffixes,
    letter runs, per-digit numbers, punctuation runs) and their ratio.
    Pure map-side expressions; the shape of every corpus-costing job."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        F.round(
            bpe_token_count(F.col("text")).cast("double")
            / token_count(F.col("text")),
            6,
        ).alias("bpe_per_word"),
    ).orderBy("doc_id")


@register(
    "text_sentences_udtf",
    tags=("llm", "text", "udtf", "lateral"),
    oracle=r"""
WITH sents AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split_regex(text, '[.!?]+'),
                          x -> regexp_replace(regexp_replace(x, '^\s+', ''), '\s+$', '')),
           x -> x != '') AS ss
  FROM documents
)
SELECT doc_id,
       len(ss) AS n_sentences,
       ROUND(list_sum(list_transform(ss, x -> length(x)))::DOUBLE / len(ss), 6)
         AS avg_sent_len
FROM sents
WHERE len(ss) > 0
ORDER BY doc_id
""",
)
def text_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a Python UDTF + LATERAL join —
    the table-function extension surface (SURVEY.md §2.11: the
    reference's only extension mechanism is `.apply`; Spark adds
    scalar/grouped/table functions, and this exercises the table one).
    Sentences = text split on [.!?]+ runs, regex-trimmed, empties
    dropped — the same spec as the DuckDB list-lambda oracle, so the
    per-doc (count, avg length) aggregate is bit-exact.  UDTFs are
    row-at-a-time Python (the slow path, like all UDxF): keep them for
    logic expressions can't say; this one exists to prove the contract,
    not to beat `F.split` (which could express it JVM-side)."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: ANN001
            parts = (
                _re.sub(r"^\s+|\s+$", "", p)
                for p in _re.split(r"[.!?]+", text or "")
            )
            for i, p in enumerate(p for p in parts if p):
                yield i, p

    spark.udtf.register("sentence_split", SentenceSplit)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS n_sentences,
               ROUND(SUM(length(s.sentence))::DOUBLE / COUNT(*), 6)
                 AS avg_sent_len
        FROM _docs_udtf d, LATERAL sentence_split(d.text) s
        GROUP BY d.doc_id
        ORDER BY d.doc_id
        """
    )
