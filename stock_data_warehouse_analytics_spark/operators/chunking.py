"""Document CHUNKING — the RAG-prep primitive: split each document
into overlapping token-window chunks with exact (doc_id, chunk_id,
start_tok, end_tok) provenance, so every downstream chunk-grained
stage (embedding, ANN, dedup, contamination) can point back into the
source document.

Reference scope: the reference engine has no chunking operator (its
corpus unit is the whole file row — e.g. ``preprocess_stocks.py``
reads one CSV row per trading day); this module is part of the
mandated LLM-data-pipeline extension surface alongside the span family
(``operators/dedup.py:exact_substring_spans``) and the sentence UDTF
(``plans/llm_text.py``).

Design for 100 TB:
- chunk boundaries are pure INTEGER arithmetic on the whitespace token
  array (starts at 0, stride, 2·stride, … < n_tokens) — map-only,
  no shuffle, no UDF, and bit-identical in any SQL engine, so the
  chunk table is oracle-exact;
- the expansion factor is bounded by construction:
  ``ceil(n_tokens / stride)`` chunks per document, each carrying at
  most ``chunk_tokens`` tokens — a fixed ≈ ``chunk_tokens/stride``×
  blow-up of the token stream, never quadratic;
- provenance is (start_tok, end_tok) HALF-OPEN 0-based intervals, the
  same convention as the substring-span family, so chunk tables and
  span tables compose (interval union, coverage) without off-by-ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["chunk_documents", "chunk_term_counts"]


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 16,
    overlap: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = True,
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, end_tok, n_tokens[, chunk_text]) —
    overlapping token windows over the whitespace tokenization (shared
    spec with the SQL oracle).

    Chunk ``i`` starts at token ``i·stride`` (``stride = chunk_tokens −
    overlap``) and carries tokens ``[start, min(start+chunk_tokens,
    n))`` — every token is covered, consecutive chunks share
    ``overlap`` tokens, the last chunk may be short.  One chunk row per
    start < n (a document whose tokenization is a single empty string
    still yields exactly one chunk — both engines tokenize ``''`` to
    ``['']``, so parity holds without special cases).

    Map-only: tokenize → ``posexplode(sequence(0, n−1, stride))`` →
    slice.  No shuffle, no Python; the chunk table inherits the input's
    partitioning."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens ({chunk_tokens}) must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be in [0, chunk_tokens) — a "
            f"negative overlap would leave tokens covered by no chunk"
        )
    stride = chunk_tokens - overlap
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # NULL text → size(NULL)=−1: gate the sequence so posexplode just
    # drops the row instead of sequence() rejecting a negative stop
    starts = F.when(
        F.col("_n") >= 1,
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
    )
    exploded = base.select(
        id_col,
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_id", "start_tok"),
    )
    end_tok = F.least(
        F.col("start_tok") + F.lit(chunk_tokens), F.col("_n")
    )
    out = exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        end_tok.cast("long").alias("end_tok"),
        (end_tok - F.col("start_tok")).cast("long").alias("n_tokens"),
        *(
            [
                F.array_join(
                    F.slice(
                        F.col("_toks"),
                        F.col("start_tok") + 1,
                        end_tok - F.col("start_tok"),
                    ),
                    " ",
                ).alias("chunk_text")
            ]
            if keep_text
            else []
        ),
    )
    return out


def chunk_term_counts(
    chunks: DataFrame,
    *,
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    text_col: str = "chunk_text",
) -> DataFrame:
    """(doc_id, chunk_id, term, cnt) — the SPARSE term-frequency
    representation of each chunk (integer counts), the input to the
    inverted-index cosine join.  Sparse-relational on purpose: at scale
    a dense per-chunk vector materializes dim×chunks doubles and
    forces dense dot products, while the sparse form joins only on
    terms the two chunks actually share, sums exact BIGINT products,
    and lets the optimizer shuffle on the term key."""
    d, c = id_cols
    return (
        chunks.select(
            d, c, F.explode(tokens(F.col(text_col))).alias("term")
        )
        .filter(F.length("term") > 0)
        .groupBy(d, c, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
