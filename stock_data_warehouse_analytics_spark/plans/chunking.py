"""Chunk-grained RAG-prep queries over ``documents`` — the composition
layer on top of ``operators/chunking.py``: the provenance chunk table
itself, chunk-level exact dedup across documents, and a chunk-grained
sparse-cosine top-k (the retrieval shape, inverted-index formulation).

Reference scope: no counterpart in the reference engine (whole-row
corpus units only); mandated LLM-pipeline extension surface —
complements the span family in ``plans/llm_dedup.py`` and the
sentence UDTF in ``plans/llm_text.py``.

All three queries are ORACLE-EXACT: chunk boundaries are integer
arithmetic, term counts are BIGINT, dot products are sums of BIGINT
products (order-free), and the only doubles (cosine) are computed from
those exact integers the same way on both engines, then rounded to
6 dp before ranking with full integer tie-breaks.
"""

from __future__ import annotations

import weakref as _weakref

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..sources.tables import load_table
from .registry import register

CHUNK_TOKENS = 16
OVERLAP = 4
STRIDE = CHUNK_TOKENS - OVERLAP

# shared whitespace tokenization spec (functions/text.py::tokens)
_SQL_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

# chunk table CTE shared by all three oracles: starts at 0, STRIDE,
# 2·STRIDE, … < n_tokens; half-open [start_tok, end_tok) windows
_SQL_CHUNKS = f"""
toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
starts AS (
  SELECT doc_id, tk, len(tk) AS n, unnest(generate_series(0, len(tk) - 1, {STRIDE})) AS s
  FROM toks WHERE len(tk) >= 1
),
chunks AS (
  SELECT doc_id,
         s // {STRIDE} AS chunk_id,
         s AS start_tok,
         LEAST(s + {CHUNK_TOKENS}, n) AS end_tok,
         LEAST(s + {CHUNK_TOKENS}, n) - s AS n_tokens,
         array_to_string(tk[s + 1 : LEAST(s + {CHUNK_TOKENS}, n)], ' ') AS chunk_text
  FROM starts
)"""


@register(
    "text_chunk_table",
    tags=("llm", "text", "chunking", "rag"),
    oracle=f"""
WITH {_SQL_CHUNKS}
SELECT doc_id, chunk_id, start_tok, end_tok, n_tokens,
       md5(chunk_text) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_id
""",
)
def text_chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CHUNK PROVENANCE TABLE — ``documents`` split into
    {CHUNK_TOKENS}-token windows overlapping by {OVERLAP}
    (``operators/chunking.py::chunk_documents``): (doc_id, chunk_id,
    start_tok, end_tok, n_tokens, md5 of the chunk text).  Map-only
    (tokenize → sequence → posexplode → slice), no shuffle except the
    presentation sort; boundaries are pure integer arithmetic, so the
    table is oracle-exact including the text digest.  This is the
    ingest step every chunk-grained query below builds on — at scale
    it is written once, partitioned like the source corpus."""
    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(
        d, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP, keep_text=True
    )
    return ch.select(
        "doc_id",
        "chunk_id",
        "start_tok",
        "end_tok",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "chunk_crossdoc_duplicates",
    tags=("llm", "chunking", "dedup", "rag"),
    oracle=f"""
WITH {_SQL_CHUNKS}
SELECT md5(chunk_text) AS chunk_md5,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc,
       MIN(n_tokens) AS n_tokens
FROM chunks
WHERE n_tokens = {CHUNK_TOKENS}
GROUP BY md5(chunk_text)
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_occurrences DESC, chunk_md5
""",
)
def chunk_crossdoc_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL EXACT DEDUP across documents — the pre-embedding
    gate of a RAG ingest pipeline: full-width chunks whose text is
    byte-identical in ≥ 2 distinct documents (one md5 hash-groupBy over
    the chunk table — the chunk-grained analog of
    ``dedup_exact_groups``; partial tail chunks are excluded so the
    report never flags sub-window coincidences).  One shuffle on a
    32-char key, linear at any corpus size; duplicate chunks are
    exactly what a production pipeline drops before paying for
    embeddings."""
    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(
        d, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP, keep_text=True
    ).filter(F.col("n_tokens") == CHUNK_TOKENS)
    return (
        ch.select("doc_id", F.md5("chunk_text").alias("chunk_md5"), "n_tokens")
        .groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), "chunk_md5")
    )


# hot-shingle df cap for the sparse cosine join: shingles present in
# more than MAX_DF chunks are dropped from BOTH sides (mirrored
# exactly in the oracle).  At scale this is the same inverted-index
# discipline as the whole-doc shingle joins — ubiquitous shingles
# create quadratic candidate blow-up and carry no ranking signal.
MAX_DF = 100
TOPK = 3
N_QUERY_DOCS = 2
SHINGLE_K = 3


@register(
    "chunk_sparse_cosine_topk",
    tags=("llm", "chunking", "similarity", "rag", "topk"),
    oracle=f"""
WITH {_SQL_CHUNKS},
ctoks AS (
  SELECT doc_id, chunk_id,
         {_SQL_TOKS.replace('text', 'chunk_text')} AS t
  FROM chunks
),
sh_all AS (
  SELECT doc_id, chunk_id, unnest(
    CASE WHEN len(t) >= {SHINGLE_K} THEN list_distinct(
           list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS term
  FROM ctoks
),
tf AS (
  SELECT doc_id, chunk_id, term FROM sh_all WHERE len(term) > 0
),
df AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= {MAX_DF}
),
tf2 AS (SELECT tf.* FROM tf JOIN df USING (term)),
nrm AS (
  SELECT doc_id, chunk_id, SQRT(CAST(COUNT(*) AS DOUBLE)) AS nn
  FROM tf2 GROUP BY doc_id, chunk_id
),
dots AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(COUNT(*) AS BIGINT) AS dp
  FROM tf2 q JOIN tf2 c USING (term)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
         ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6) AS cosine
  FROM dots d
  JOIN nrm nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
  JOIN nrm nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY q_doc, q_chunk
           ORDER BY cosine DESC, c_doc, c_chunk) AS rnk
  FROM scored
)
SELECT q_doc, q_chunk, c_doc, c_chunk, cosine, rnk
FROM ranked WHERE rnk <= {TOPK}
ORDER BY q_doc, q_chunk, rnk
""",
)
def chunk_sparse_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-GRAINED RETRIEVAL top-k — for every chunk of the query
    documents (doc_id < {N_QUERY_DOCS}), the {TOPK} most similar
    corpus chunks by word-{SHINGLE_K}-gram shingle-SET cosine
    (|shared shingles| / √|A|·√|B|), computed SPARSE: an
    inverted-index join on shared shingles (df-capped at {MAX_DF},
    the whole-doc shingle-join discipline), exact BIGINT intersection
    counts, norms from integer set sizes — oracle-exact with no dense
    vector ever materialized.  Shingles, not unigrams, on purpose:
    word ORDER is the lexical signal at chunk granularity (and on
    this corpus the unigram vocabulary is ~31 terms — every chunk
    would share every term).  This is the scale formulation: the
    corpus side shuffles once on the shingle key, candidates are only
    chunk pairs sharing ≥1 surviving shingle, and the final top-k is
    a bounded per-query-chunk window.  (The embedding-space analog —
    same chunk table feeding hyperplane/IVF ANN — is the
    ``sim_topk_*`` family; this query is the lexical twin used for
    hybrid retrieval.)

    Served from the SESSION-staged sparse retrieval leg
    (``_hybrid_legs_for`` — the same tf/df-cap/cosine/tie-break
    pipeline at leg depth {_HY_DEPTH} ≥ TOPK, cosine carried), so the
    chunk+shingle explode and the inverted-index join run once per
    session for this query, the hybrid panel and the recall evals
    alike; this query is a rank-cut + rename over that checkpointed
    leg.  Results bit-identical to the standalone pipeline (same
    window order, same round-6 cosine; oracle-exact either way)."""
    sparse, _dense = _hybrid_legs_for(spark, sf_dir)
    return (
        sparse.filter(F.col("s_rnk") <= TOPK)
        .select(
            "q_doc",
            "q_chunk",
            "c_doc",
            "c_chunk",
            "cosine",
            F.col("s_rnk").alias("rnk"),
        )
        .orderBy("q_doc", "q_chunk", "rnk")
    )


# chunk flagged as contaminated iff ≥ this many of its tokens sit
# inside a verbatim test↔train shared span (the substring-dedup seed
# width — anything shorter cannot even seed a span)
CHUNK_BAD_TOKENS = 8

# the two mirrored CTE chains both define `toks`; DuckDB scopes a WITH
# inside derived-table parentheses (ROUND_NOTES gotcha), so the span
# chain nests cleanly inside one derived table
from .llm_dedup import _SQL_SPANS as _SQL_SPANS_CTE  # noqa: E402

_CONTAM_CHUNK_ORACLE = f"""
WITH {_SQL_CHUNKS},
sp AS (
  SELECT * FROM (WITH {_SQL_SPANS_CTE}
                 SELECT doc_a, doc_b, start_a, start_b, span_tokens
                 FROM spans)
),
tiv AS (
  -- DISTINCT: duplicate (doc, s, e) twins break the two island
  -- windows' shared ordering (see union_intervals / span coverage)
  SELECT DISTINCT doc, s, e FROM (
    SELECT doc_a AS doc, start_a AS s, start_a + span_tokens - 1 AS e
    FROM sp WHERE doc_a % 2 = 0 AND doc_b % 2 = 1
    UNION ALL
    SELECT doc_b, start_b, start_b + span_tokens - 1
    FROM sp WHERE doc_b % 2 = 0 AND doc_a % 2 = 1
  )
),
u AS (
  SELECT doc, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                  PARTITION BY doc ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM tiv
),
u2 AS (
  SELECT doc, s, e,
         SUM(brk) OVER (PARTITION BY doc ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS grp2
  FROM u
),
ui AS (SELECT doc, MIN(s) AS ms, MAX(e) AS me FROM u2 GROUP BY doc, grp2),
tchunks AS (
  SELECT doc_id, chunk_id, start_tok, end_tok FROM chunks
  WHERE doc_id % 2 = 0
),
ov AS (
  SELECT c.doc_id, c.chunk_id,
         CAST(SUM(GREATEST(0, LEAST(c.end_tok, ui.me)
                              - GREATEST(c.start_tok + 1, ui.ms) + 1))
              AS BIGINT) AS bad_tokens
  FROM tchunks c JOIN ui ON ui.doc = c.doc_id
  GROUP BY 1, 2
),
per_chunk AS (
  SELECT t.doc_id, t.chunk_id, COALESCE(o.bad_tokens, 0) AS bad_tokens
  FROM tchunks t LEFT JOIN ov o USING (doc_id, chunk_id)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) FILTER (WHERE bad_tokens >= {CHUNK_BAD_TOKENS})
            AS BIGINT) AS n_bad_chunks,
       CAST(SUM(bad_tokens) AS BIGINT) AS bad_token_total,
       ROUND(CAST(COUNT(*) FILTER (WHERE bad_tokens >= {CHUNK_BAD_TOKENS})
                  AS DOUBLE) / COUNT(*), 6) AS drop_fraction
FROM per_chunk
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "contamination_chunk_level",
    tags=("llm", "chunking", "contamination", "dedup", "rag"),
    oracle=_CONTAM_CHUNK_ORACLE,
)
def contamination_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL contamination — the ACTIONABLE grain of eval-hygiene
    in a RAG/pretraining pipeline: ``contamination_span_level`` says a
    train doc leaks benchmark text and WHERE; this query says which
    CHUNKS to drop (the unit a chunked ingest actually deletes, keeping
    the rest of the doc).  Composition of three existing primitives:
    the session-cached maximal-span table (``_substring_spans``), the
    generic interval UNION (``operators/dedup.union_intervals`` — a doc
    contaminated by many partners must not double-count overlapping
    spans), and the chunk table — intersected with pure integer
    arithmetic, so the whole report is oracle-exact.  Per train doc
    (even doc_id): chunk count, chunks with ≥ {CHUNK_BAD_TOKENS}
    contaminated tokens, total contaminated tokens across chunks
    (overlap double-counts tokens shared by two overlapping chunks —
    it is a per-CHUNK decision metric, not a doc-coverage metric), and
    the drop fraction.  Scale: spans ≪ corpus, islands ≪ spans; the
    chunk×island join is co-partitioned on doc_id — one shuffle each
    side, no quadratic stage."""
    from ..operators.dedup import union_intervals
    from .llm_dedup import _substring_spans

    d = load_table(spark, sf_dir, "documents")
    spans = _substring_spans(spark, sf_dir)
    t1 = spans.filter(
        (F.col("doc_a") % 2 == 0) & (F.col("doc_b") % 2 == 1)
    ).select(
        F.col("doc_a").alias("doc"),
        F.col("start_a").alias("s"),
        (F.col("start_a") + F.col("span_tokens") - 1).alias("e"),
    )
    t2 = spans.filter(
        (F.col("doc_b") % 2 == 0) & (F.col("doc_a") % 2 == 1)
    ).select(
        F.col("doc_b").alias("doc"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_tokens") - 1).alias("e"),
    )
    ui = union_intervals(t1.unionByName(t2), key_cols=["doc"])
    ch = chunk_documents(
        d, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP, keep_text=False
    ).filter(F.col("doc_id") % 2 == 0)
    # chunk [start_tok, end_tok) is 0-based half-open; spans/islands
    # are 1-based inclusive — chunk tokens in 1-based terms are
    # [start_tok+1, end_tok]
    ov = (
        ch.join(ui, ch["doc_id"] == ui["doc"])
        .select(
            "doc_id",
            "chunk_id",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("end_tok"), F.col("me"))
                - F.greatest(F.col("start_tok") + 1, F.col("ms"))
                + 1,
            ).alias("_ov"),
        )
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("_ov").cast("long").alias("bad_tokens"))
    )
    per_chunk = ch.select("doc_id", "chunk_id").join(
        ov, ["doc_id", "chunk_id"], "left"
    ).select(
        "doc_id",
        "chunk_id",
        F.coalesce("bad_tokens", F.lit(0)).alias("bad_tokens"),
    )
    return (
        per_chunk.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count(
                F.when(F.col("bad_tokens") >= CHUNK_BAD_TOKENS, 1)
            )
            .cast("long")
            .alias("n_bad_chunks"),
            F.sum("bad_tokens").cast("long").alias("bad_token_total"),
        )
        .withColumn(
            "drop_fraction",
            F.round(F.col("n_bad_chunks") / F.col("n_chunks"), 6),
        )
        .orderBy("doc_id")
    )




@register(
    "stream_chunk_admission",
    tags=("streaming", "llm", "chunking", "dedup", "admission"),
    oracle=f"""
WITH {_SQL_CHUNKS},
idx AS (
  SELECT md5(chunk_text) AS chunk_md5, doc_id AS corpus_doc_id
  FROM chunks WHERE doc_id % 2 = 0
),
newc AS (
  SELECT doc_id, chunk_id, md5(chunk_text) AS chunk_md5
  FROM chunks WHERE doc_id % 2 = 1
),
hits AS (
  SELECT n.doc_id, n.chunk_id,
         CAST(COUNT(DISTINCT i.corpus_doc_id) AS BIGINT) AS n_partners
  FROM newc n JOIN idx i USING (chunk_md5)
  GROUP BY n.doc_id, n.chunk_id
),
per_doc AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(COUNT(h.chunk_id) AS BIGINT) AS n_dup_chunks,
         CAST(COALESCE(SUM(h.n_partners), 0) AS BIGINT) AS n_match_events
  FROM (SELECT doc_id, chunk_id FROM chunks WHERE doc_id % 2 = 1) c
  LEFT JOIN hits h USING (doc_id, chunk_id)
  GROUP BY c.doc_id
)
SELECT doc_id, n_chunks, n_dup_chunks, n_match_events,
       ROUND(CAST(n_dup_chunks AS DOUBLE) / n_chunks, 6) AS dup_fraction,
       n_dup_chunks > 0 AS any_dup
FROM per_doc
ORDER BY doc_id
""",
)
def stream_chunk_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING CHUNK admission
    (``streaming/admission.py::chunk_admission_matches``): odd-doc_id
    documents play the arriving stream, even the existing corpus.
    Each arriving doc is chunked MAP-SIDE (chunking is tokenize →
    sequence → posexplode → slice — fully stateless, so it runs
    unchanged under readStream), chunks are md5-fingerprinted and
    probed against the static corpus chunk index; the decision layer
    reports per arriving doc how many of its chunks already exist
    verbatim in the corpus (the pre-embedding skip list of a RAG
    ingest).  Stream ≡ batch asserted in
    tests/test_streaming_multimodal.py::
    test_stream_chunk_admission_equals_batch.  Oracle-exact: chunk
    boundaries are integer arithmetic and the probe is an md5
    equi-join.  At scale the index is bucketed by chunk_md5 —
    micro-batches join bucket-locally, the hot path carries no state
    store."""
    from ..streaming.admission import chunk_admission_matches

    d = load_table(spark, sf_dir, "documents")
    corpus_idx = chunk_documents(
        d.filter(F.col("doc_id") % 2 == 0),
        chunk_tokens=CHUNK_TOKENS,
        overlap=OVERLAP,
        keep_text=True,
    ).select(
        F.md5("chunk_text").alias("chunk_md5"),
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("chunk_id").alias("corpus_chunk_id"),
    )
    arriving = d.filter(F.col("doc_id") % 2 == 1)
    # chunk the arriving half ONCE; both the probe side and the
    # denominator derive from this frame (the streaming path's
    # chunk_admission_matches re-chunks internally because a stream
    # has no second pass — here Catalyst would otherwise evaluate two
    # independent chunk_documents subtrees; stream ≡ batch is pinned
    # by the parity test either way)
    newc = chunk_documents(
        arriving, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP, keep_text=True
    ).select("doc_id", "chunk_id", F.md5("chunk_text").alias("chunk_md5"))
    hits = (
        newc.join(corpus_idx, "chunk_md5")
        .groupBy("doc_id", "chunk_id")
        .agg(F.count_distinct("corpus_doc_id").cast("long").alias("n_partners"))
    )
    all_chunks = newc.select("doc_id", "chunk_id")
    return (
        all_chunks.join(hits, ["doc_id", "chunk_id"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count("n_partners").cast("long").alias("n_dup_chunks"),
            F.coalesce(F.sum("n_partners"), F.lit(0))
            .cast("long")
            .alias("n_match_events"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            "n_match_events",
            F.round(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 6
            ).alias("dup_fraction"),
            (F.col("n_dup_chunks") > 0).alias("any_dup"),
        )
        .orderBy("doc_id")
    )


HASH_DIM = 64
CHUNK_KEY_MUL = 1_000_000  # chunk_key = doc_id·MUL + chunk_id; a chunk
# id needs > 10⁶ only for a doc of > 12M tokens at stride 12 — beyond
# any single training document; at that point widen to a struct key


def chunk_hashed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chunk_key, embedding) — DETERMINISTIC hashed shingle-count
    vectors per chunk (the hashing trick: each word-3-gram increments
    bucket ``hash_int60(term) % {HASH_DIM}``), built fully
    relationally: explode → group → map_from_entries → densify.  This
    is the bridge that lets the CHUNK table flow into the existing
    embedding/ANN operators (``topk_lsh``/``topk_bruteforce``/IVF)
    when no learned embedding column exists — the lexical fallback of
    a hybrid RAG index.  No RNG, no Python UDF; vectors are integer
    counts cast to double, so downstream cosine ranking is
    reproducible everywhere."""
    # built from the SESSION-staged chunk+shingle table (the corpus
    # explode runs once for the whole chunk family; the key encoding
    # and every downstream expression are unchanged)
    sh = _chunk_tf_for(spark, sf_dir).select(
        (F.col("doc_id") * CHUNK_KEY_MUL + F.col("chunk_id")).alias(
            "chunk_key"
        ),
        "term",
    )
    return _densify_hashed(sh)


def hashed_chunk_vectors(ch: DataFrame) -> DataFrame:
    """(chunk_key, embedding) over an arbitrary chunk frame — the
    densify core factored from ``chunk_hashed_vectors`` (identical
    plan; that query's substitute tests pin it) for reuse by the
    end-to-end RAG composition over a DEDUPED chunk table."""
    from ..functions.text import shingles

    sh = ch.select(
        (F.col("doc_id") * CHUNK_KEY_MUL + F.col("chunk_id")).alias(
            "chunk_key"
        ),
        F.explode(shingles(F.col("chunk_text"), SHINGLE_K)).alias("term"),
    ).filter(F.length("term") > 0)
    return _densify_hashed(sh)


def _densify_hashed(sh: DataFrame) -> DataFrame:
    """Densify (chunk_key, term) into the HASH_DIM count vector."""
    from ..operators.dedup import hash_int60

    tf = sh.groupBy(
        "chunk_key", (hash_int60(F.col("term")) % HASH_DIM).cast("int").alias("b")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    return (
        tf.groupBy("chunk_key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("b", "cnt"))
            ).alias("_m")
        )
        .select(
            "chunk_key",
            F.transform(
                F.sequence(F.lit(0), F.lit(HASH_DIM - 1)),
                lambda j: F.coalesce(
                    F.element_at(F.col("_m"), j.cast("int")), F.lit(0.0)
                ),
            ).alias("embedding"),
        )
    )


@register(
    "chunk_ann_lsh_topk",
    tags=("llm", "chunking", "similarity", "ann", "lsh", "rag"),
    oracle=None,  # hyperplane-LSH candidate set over derived vectors —
    # recall vs the brute-force baseline + determinism pinned by
    # tests/test_chunking.py::test_chunk_ann_lsh_recall
)
def chunk_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-GRAINED ANN — the chunk table fed through the EXISTING
    embedding ANN stack (VERDICT r4 action #5's composition ask):
    hashed shingle-count vectors (``chunk_hashed_vectors``, {HASH_DIM}
    buckets) indexed with the hyperplane-LSH operator
    (``operators/similarity.topk_lsh`` — signature prefilter, exact
    cosine re-rank), queries = chunks of doc_id < {N_QUERY_DOCS}.
    Rows-only; recall vs the brute-force baseline on the SAME vectors
    + determinism pinned by tests/test_chunking.py::
    test_chunk_ann_lsh_recall.  Scale shape: signatures are a narrow
    integer column computed once at ingest, the corpus never
    shuffles, candidates are hamming-filtered before any vector
    math — identical economics to the learned-embedding path."""
    from ..operators.similarity import _hyperplane_sigs_norms, topk_lsh

    # ONE fused job builds the (id, normalized vector, signature)
    # table: densify flows straight into the Arrow kernel and the
    # narrow result is checkpointed — r9 ran this as TWO Arrow passes
    # (corpus + query side) over a separately checkpointed vector
    # table; the query side is a subset of the corpus, so it is now a
    # filter+rename over the one staged pass (topk_lsh's
    # cand_sigs/query_sigs overrides).  8 partitions: the Arrow pass
    # is task-overhead-bound at 32 on ~25k rows; at scale this is a
    # repartition sized to ~100 MB of vectors per partition, not a
    # constant.
    sigs = _hyperplane_sigs_norms(
        chunk_hashed_vectors(spark, sf_dir)
        .coalesce(8)
        .select(F.col("chunk_key").alias("neighbor_id"), "embedding"),
        vec_col="embedding",
        vn_col="_cn",
        sig_col="_csig",
        dim=HASH_DIM,
        n_planes=16,
    ).localCheckpoint(eager=True)
    qsigs = sigs.filter(
        F.col("neighbor_id") < N_QUERY_DOCS * CHUNK_KEY_MUL
    ).select(
        F.col("neighbor_id").alias("query_id"),
        F.col("_cn").alias("_qn"),
        F.col("_csig").alias("_qsig"),
    )
    return topk_lsh(
        None,
        None,
        k=TOPK,
        dim=HASH_DIM,
        n_planes=16,
        max_hamming=6,
        id_col="chunk_key",
        fast=True,  # rows-only path: numpy signature kernel
        cand_sigs=sigs,
        query_sigs=qsigs,
    ).orderBy("query_id", "rnk")


# ---------------------------------------------------------------------
# CHUNK-GRAIN HYBRID RETRIEVAL (VERDICT r5 action #4): the sparse
# shingle-cosine leg and a dense leg over the hashed chunk vectors,
# fused with reciprocal-rank fusion — the production RAG retriever
# shape at chunk granularity.
# ---------------------------------------------------------------------
_HY_DEPTH = 10  # per-leg candidate depth fed into the fusion
_HY_K = 60      # the standard RRF smoothing constant
_HY_OUT = 5     # fused list length per query chunk

_SQL_HASH60 = "CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)"


@register(
    "chunk_hybrid_rrf_topk",
    tags=("llm", "chunking", "retrieval", "rrf", "hybrid", "rag"),
    oracle=f"""
WITH {_SQL_CHUNKS},
ctoks AS (
  SELECT doc_id, chunk_id,
         {_SQL_TOKS.replace('text', 'chunk_text')} AS t
  FROM chunks
),
sh_all AS (
  SELECT doc_id, chunk_id, unnest(
    CASE WHEN len(t) >= {SHINGLE_K} THEN list_distinct(
           list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS term
  FROM ctoks
),
tf AS (
  SELECT doc_id, chunk_id, term FROM sh_all WHERE len(term) > 0
),
df AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= {MAX_DF}
),
tf2 AS (SELECT tf.* FROM tf JOIN df USING (term)),
nrm AS (
  SELECT doc_id, chunk_id, SQRT(CAST(COUNT(*) AS DOUBLE)) AS nn
  FROM tf2 GROUP BY doc_id, chunk_id
),
dots AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(COUNT(*) AS BIGINT) AS dp
  FROM tf2 q JOIN tf2 c USING (term)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
sparse AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, rnk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM dots d
    JOIN nrm nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN nrm nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_HY_DEPTH}
),
hb AS (
  SELECT doc_id, chunk_id,
         CAST({_SQL_HASH60} % {HASH_DIM} AS INTEGER) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tf GROUP BY 1, 2, 3
),
hn AS (
  SELECT doc_id, chunk_id,
         SQRT(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nn
  FROM hb GROUP BY 1, 2
),
hd AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(SUM(q.cnt * c.cnt) AS BIGINT) AS dp
  FROM hb q JOIN hb c USING (b)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
dense AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, rnk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM hd d
    JOIN hn nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN hn nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_HY_DEPTH}
),
fused AS (
  SELECT COALESCE(d.q_doc, s.q_doc) AS q_doc,
         COALESCE(d.q_chunk, s.q_chunk) AS q_chunk,
         COALESCE(d.c_doc, s.c_doc) AS c_doc,
         COALESCE(d.c_chunk, s.c_chunk) AS c_chunk,
         COALESCE(1.0 / ({_HY_K} + d.rnk), 0)
           + COALESCE(1.0 / ({_HY_K} + s.rnk), 0) AS score
  FROM dense d
  FULL OUTER JOIN sparse s
    ON s.q_doc = d.q_doc AND s.q_chunk = d.q_chunk
   AND s.c_doc = d.c_doc AND s.c_chunk = d.c_chunk
)
SELECT q_doc, q_chunk, c_doc, c_chunk, rrf_rank,
       ROUND(score, 9) AS rrf_score
FROM (
  SELECT q_doc, q_chunk, c_doc, c_chunk, score,
         ROW_NUMBER() OVER (
           PARTITION BY q_doc, q_chunk
           ORDER BY CAST(ROUND(score * 1000000000, 0) AS BIGINT) DESC,
                    c_doc, c_chunk
         ) AS rrf_rank
  FROM fused
) WHERE rrf_rank <= {_HY_OUT}
ORDER BY q_doc, q_chunk, rrf_rank
""",
)
def chunk_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-GRAIN HYBRID RETRIEVAL — the production RAG retriever
    shape (VERDICT r5 action #4): for every chunk of the query
    documents, a SPARSE leg (df-capped shingle-set cosine, the
    ``chunk_sparse_cosine_topk`` inverted-index formulation at depth
    _HY_DEPTH = 10) and a DENSE leg (exact cosine over the deterministic
    HASH_DIM-bucket hashed shingle-count vectors of
    ``chunk_hashed_vectors``) are fused with reciprocal-rank fusion
    Σ 1/(_HY_K + rank), _HY_K = 60, and re-ranked to the top _HY_OUT = 5
    per query chunk.

    ORACLE-EXACT end to end: both legs rank 6-dp-rounded cosines built
    from BIGINT dot products with full (c_doc, c_chunk) tiebreaks, and
    the fused score — a sum of ≤ 2 deterministic doubles — re-quantizes
    to nano-units before the final rank (the ``sim_hybrid_rrf``
    doc-grain stance, applied at chunk grain).  The dense leg here is
    the BRUTE-FORCE baseline so the whole fusion is SQL-expressible;
    the unbounded-query-set scale path swaps in the LSH leg
    (``chunk_ann_lsh_topk``) — fusion quality of that swap is measured
    by tests/test_chunking.py::test_chunk_hybrid_lsh_leg_recall.

    Scale shape: ONE chunk+shingle pass feeds both legs (the tf table
    is computed once); the sparse leg shuffles on the df-capped shingle
    key (candidates only where a shingle is shared); the dense leg's
    bucket join is a HASH_DIM-key equi-join whose q-side is the BOUNDED
    query set; fusion joins two depth-_HY_DEPTH lists per query chunk.
    The legs come from the session-memoized ``_hybrid_legs_for`` store,
    shared with the two retrieval-eval panels."""
    sparse, dense = _hybrid_legs_for(spark, sf_dir)
    return _rrf_fuse(sparse, dense, out_depth=_HY_OUT).orderBy(
        "q_doc", "q_chunk", "rrf_rank"
    )


def hybrid_fused_candidates(
    ch: DataFrame, *, leg_depth: int = _HY_DEPTH, out_depth: int = _HY_OUT
) -> DataFrame:
    """The hybrid-retrieval CORE over an arbitrary chunk frame (must
    carry doc_id, chunk_id, chunk_text): sparse + dense legs at
    ``leg_depth`` fused by RRF and cut to ``out_depth`` per query
    chunk.  Factored from ``chunk_hybrid_rrf_topk`` (identical plan at
    the defaults — that query's oracle pins ``_hybrid_legs`` +
    ``_rrf_fuse``, the exact composition here) so the end-to-end RAG
    composition (``plans/rag_e2e.py``) can run the SAME retriever over
    a DEDUPED chunk frame at a deeper fused cut (which is why this
    keeps the explicit ``ch`` argument instead of the memoized
    standard-corpus legs of ``_hybrid_legs_for``)."""
    sparse, dense = _hybrid_legs(ch, leg_depth=leg_depth)
    return _rrf_fuse(sparse, dense, out_depth=out_depth)


_LEGS_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def _hybrid_legs_for(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The staged depth-_HY_DEPTH (sparse, dense) leg rankings over the
    STANDARD document chunking, localCheckpointed eagerly and memoized
    per (session, sf_dir) — the ``_daily_cum_moments`` `_MOMENTS_CACHE`
    pattern applied to retrieval (r7 verdict action #2).  THREE
    registered consumers share one chunk+shingle pass per session:
    ``chunk_hybrid_rrf_topk``, ``eval_rag_retrieval_recall`` and
    ``eval_retrieval_mrr_map`` each derive every frame they rank from
    these two (q_chunk × depth)-bounded checkpointed lists, so the
    corpus-sized explode + df census + both leg joins run ONCE per
    session instead of once per panel.  The checkpointed frames are
    candidate-list-grain (≤ |query chunks| × depth rows each), never
    corpus-sized.  STALENESS CONTRACT: same as ``_MOMENTS_CACHE`` —
    the key is never invalidated; rewriting parquet under ``sf_dir``
    within one SparkSession serves the pre-rewrite snapshot (inputs
    are immutable per run; a mutating pipeline must start a fresh
    session or key on a dir fingerprint)."""
    per_session = _LEGS_CACHE.setdefault(spark, {})
    if sf_dir not in per_session:
        sparse, dense = _legs_from_tf(
            _chunk_tf_for(spark, sf_dir), leg_depth=_HY_DEPTH
        )
        per_session[sf_dir] = (
            sparse.localCheckpoint(eager=True),
            dense.localCheckpoint(eager=True),
        )
    return per_session[sf_dir]


def _chunk_tf_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-staged (doc_id, chunk_id, term) chunk+shingle table
    over the STANDARD chunking — the substrate both the hybrid legs
    and the hashed-vector build (``chunk_hashed_vectors``) start from;
    staged once per (session, sf_dir) so the corpus explode runs once
    for the whole chunk family.  Same staleness contract as
    ``_hybrid_legs_for``."""
    from ..functions.text import shingles

    per_session = _LEGS_CACHE.setdefault(spark, {})
    key = (sf_dir, "_tf")
    if key not in per_session:
        ch = chunk_documents(
            load_table(spark, sf_dir, "documents"),
            chunk_tokens=CHUNK_TOKENS,
            overlap=OVERLAP,
            keep_text=True,
        )
        tf = ch.select(
            "doc_id",
            "chunk_id",
            F.explode(shingles(F.col("chunk_text"), SHINGLE_K)).alias("term"),
        ).filter(F.length("term") > 0)
        per_session[key] = tf.localCheckpoint(eager=True)
    return per_session[key]


def _hybrid_legs(
    ch: DataFrame, *, leg_depth: int = _HY_DEPTH
) -> tuple[DataFrame, DataFrame]:
    """Both retrieval legs over one staged chunk+shingle pass: the
    sparse df-capped shingle-set-cosine ranking (s_rnk ≤ leg_depth)
    and the dense hashed-bucket-vector cosine ranking (d_rnk ≤
    leg_depth), each keyed (q_doc, q_chunk, c_doc, c_chunk).  Exposed
    separately from the fusion so ``eval_rag_retrieval_recall`` can
    derive truth (sparse top-k), the dense list AND the hybrid list
    from ONE pair of staged legs instead of re-deriving the shingle
    pipeline per ranking (the round-6 verdict's leg-sharing action)."""
    from ..functions.text import shingles

    tf = (
        ch.select(
            "doc_id",
            "chunk_id",
            F.explode(shingles(F.col("chunk_text"), SHINGLE_K)).alias("term"),
        )
        .filter(F.length("term") > 0)
        # consumed by FIVE branches (df census, tf2 join, q/c sides,
        # dense hb) — without this the chunk+shingle explode re-runs
        # per branch; at scale this is the staged shingle table every
        # production retrieval pipeline writes once per corpus batch
        .localCheckpoint(eager=True)
    )
    return _legs_from_tf(tf, leg_depth=leg_depth)


def _legs_from_tf(
    tf: DataFrame, *, leg_depth: int = _HY_DEPTH
) -> tuple[DataFrame, DataFrame]:
    """The leg construction proper, over an already-materialized
    (doc_id, chunk_id, term) table (``_chunk_tf_for`` or
    ``_hybrid_legs``'s own checkpoint) — identical expressions either
    way."""
    from ..operators.dedup import hash_int60

    # ---------------- sparse leg (df-capped shingle-set cosine)
    surviving = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= MAX_DF)
        .select("term")
    )
    tf2 = tf.join(surviving, "term")
    nrm = tf2.groupBy("doc_id", "chunk_id").agg(
        F.sqrt(F.count(F.lit(1)).cast("double")).alias("nn")
    )
    q = tf2.filter(F.col("doc_id") < N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_id").alias("q_chunk"),
        "term",
    )
    c = tf2.filter(F.col("doc_id") >= N_QUERY_DOCS).select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_id").alias("c_chunk"),
        "term",
    )
    dots = (
        q.join(c, "term")
        .groupBy("q_doc", "q_chunk", "c_doc", "c_chunk")
        .agg(F.count(F.lit(1)).cast("long").alias("dp"))
    )
    nq = nrm.select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_id").alias("q_chunk"),
        F.col("nn").alias("_qn"),
    )
    nc = nrm.select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_id").alias("c_chunk"),
        F.col("nn").alias("_cn"),
    )
    w_sp = Window.partitionBy("q_doc", "q_chunk").orderBy(
        F.desc("cosine"), "c_doc", "c_chunk"
    )
    sparse = (
        dots.join(F.broadcast(nq), ["q_doc", "q_chunk"])
        .join(nc, ["c_doc", "c_chunk"])
        .select(
            "q_doc",
            "q_chunk",
            "c_doc",
            "c_chunk",
            F.round(
                F.col("dp").cast("double") / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
        .withColumn("s_rnk", F.row_number().over(w_sp))
        .filter(F.col("s_rnk") <= leg_depth)
        # cosine kept: chunk_sparse_cosine_topk serves its oracle-exact
        # top-k straight from this staged leg (rank cut ≤ leg depth);
        # every other consumer selects its columns explicitly
        .select("q_doc", "q_chunk", "c_doc", "c_chunk", "cosine", "s_rnk")
    )

    # ---------------- dense leg (hashed-bucket count vectors, exact)
    hb = tf.groupBy(
        "doc_id",
        "chunk_id",
        (hash_int60(F.col("term")) % HASH_DIM).cast("int").alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    hn = hb.groupBy("doc_id", "chunk_id").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).cast("double")).alias(
            "nn"
        )
    )
    hq = hb.filter(F.col("doc_id") < N_QUERY_DOCS).select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_id").alias("q_chunk"),
        "b",
        F.col("cnt").alias("qcnt"),
    )
    hc = hb.filter(F.col("doc_id") >= N_QUERY_DOCS).select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_id").alias("c_chunk"),
        "b",
        F.col("cnt").alias("ccnt"),
    )
    hd = (
        hq.join(hc, "b")
        .groupBy("q_doc", "q_chunk", "c_doc", "c_chunk")
        .agg(F.sum(F.col("qcnt") * F.col("ccnt")).cast("long").alias("dp"))
    )
    hnq = hn.select(
        F.col("doc_id").alias("q_doc"),
        F.col("chunk_id").alias("q_chunk"),
        F.col("nn").alias("_qn"),
    )
    hnc = hn.select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_id").alias("c_chunk"),
        F.col("nn").alias("_cn"),
    )
    w_d = Window.partitionBy("q_doc", "q_chunk").orderBy(
        F.desc("cosine"), "c_doc", "c_chunk"
    )
    dense = (
        hd.join(F.broadcast(hnq), ["q_doc", "q_chunk"])
        .join(hnc, ["c_doc", "c_chunk"])
        .select(
            "q_doc",
            "q_chunk",
            "c_doc",
            "c_chunk",
            F.round(
                F.col("dp").cast("double") / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
        .withColumn("d_rnk", F.row_number().over(w_d))
        .filter(F.col("d_rnk") <= leg_depth)
        .select("q_doc", "q_chunk", "c_doc", "c_chunk", "d_rnk")
    )
    return sparse, dense


def _rrf_fuse(
    sparse: DataFrame, dense: DataFrame, *, out_depth: int = _HY_OUT
) -> DataFrame:
    """RRF fusion of the two leg rankings (Σ 1/(K + rank), nano-
    requantized before the final per-query-chunk rank — see
    ``chunk_hybrid_rrf_topk``)."""
    keys = ["q_doc", "q_chunk", "c_doc", "c_chunk"]
    fused = dense.join(sparse, keys, "full_outer").select(
        *keys,
        (
            F.coalesce(1.0 / (_HY_K + F.col("d_rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (_HY_K + F.col("s_rnk")), F.lit(0.0))
        ).alias("score"),
    )
    w_f = Window.partitionBy("q_doc", "q_chunk").orderBy(
        F.desc(F.round(F.col("score") * 1000000000, 0).cast("bigint")),
        "c_doc",
        "c_chunk",
    )
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w_f))
        .filter(F.col("rrf_rank") <= out_depth)
        .select(
            *keys,
            "rrf_rank",
            F.round(F.col("score"), 9).alias("rrf_score"),
        )
    )


chunk_hybrid_rrf_topk.__doc__ = chunk_hybrid_rrf_topk.__doc__.format(
    depth=_HY_DEPTH, dim=HASH_DIM, k=_HY_K, out=_HY_OUT
)


# ------------------------------------------- retrieval recall panel

_RC_K = 5  # recall depth


@register(
    "eval_rag_retrieval_recall",
    tags=("llm", "chunking", "retrieval", "eval", "recall", "rag"),
    oracle=f"""
WITH {_SQL_CHUNKS},
ctoks AS (
  SELECT doc_id, chunk_id,
         {_SQL_TOKS.replace('text', 'chunk_text')} AS t
  FROM chunks
),
sh_all AS (
  SELECT doc_id, chunk_id, unnest(
    CASE WHEN len(t) >= {SHINGLE_K} THEN list_distinct(
           list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS term
  FROM ctoks
),
tf AS (
  SELECT doc_id, chunk_id, term FROM sh_all WHERE len(term) > 0
),
df AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= {MAX_DF}
),
tf2 AS (SELECT tf.* FROM tf JOIN df USING (term)),
nrm AS (
  SELECT doc_id, chunk_id, SQRT(CAST(COUNT(*) AS DOUBLE)) AS nn
  FROM tf2 GROUP BY doc_id, chunk_id
),
dots AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(COUNT(*) AS BIGINT) AS dp
  FROM tf2 q JOIN tf2 c USING (term)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
sparse AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM dots d
    JOIN nrm nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN nrm nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_RC_K}
),
hb AS (
  SELECT doc_id, chunk_id,
         CAST({_SQL_HASH60} % {HASH_DIM} AS INTEGER) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tf GROUP BY 1, 2, 3
),
hn AS (
  SELECT doc_id, chunk_id,
         SQRT(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nn
  FROM hb GROUP BY 1, 2
),
hd AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(SUM(q.cnt * c.cnt) AS BIGINT) AS dp
  FROM hb q JOIN hb c USING (b)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
dense AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, rnk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM hd d
    JOIN hn nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN hn nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_HY_DEPTH}
),
sparse10 AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, rnk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM dots d
    JOIN nrm nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN nrm nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_HY_DEPTH}
),
fused AS (
  SELECT COALESCE(d.q_doc, s.q_doc) AS q_doc,
         COALESCE(d.q_chunk, s.q_chunk) AS q_chunk,
         COALESCE(d.c_doc, s.c_doc) AS c_doc,
         COALESCE(d.c_chunk, s.c_chunk) AS c_chunk,
         COALESCE(1.0 / ({_HY_K} + d.rnk), 0)
           + COALESCE(1.0 / ({_HY_K} + s.rnk), 0) AS score
  FROM dense d
  FULL OUTER JOIN sparse10 s
    ON s.q_doc = d.q_doc AND s.q_chunk = d.q_chunk
   AND s.c_doc = d.c_doc AND s.c_chunk = d.c_chunk
),
hybrid AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk FROM (
    SELECT q_doc, q_chunk, c_doc, c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY q_doc, q_chunk
             ORDER BY CAST(ROUND(score * 1000000000, 0) AS BIGINT) DESC,
                      c_doc, c_chunk
           ) AS rrf_rank
    FROM fused
  ) WHERE rrf_rank <= {_RC_K}
),
truth_n AS (
  SELECT q_doc, q_chunk, CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM sparse GROUP BY q_doc, q_chunk
),
hits AS (
  SELECT t.q_doc, t.q_chunk, t.n_truth,
         CAST(COUNT(de.c_doc) AS BIGINT) AS dense_hits,
         CAST(COUNT(hy.c_doc) AS BIGINT) AS hybrid_hits
  FROM truth_n t
  JOIN sparse s ON s.q_doc = t.q_doc AND s.q_chunk = t.q_chunk
  LEFT JOIN dense de
    ON de.q_doc = s.q_doc AND de.q_chunk = s.q_chunk
   AND de.c_doc = s.c_doc AND de.c_chunk = s.c_chunk
   AND de.rnk <= {_RC_K}
  LEFT JOIN hybrid hy
    ON hy.q_doc = s.q_doc AND hy.q_chunk = s.q_chunk
   AND hy.c_doc = s.c_doc AND hy.c_chunk = s.c_chunk
  GROUP BY t.q_doc, t.q_chunk, t.n_truth
),
per_chunk AS (
  SELECT q_doc, q_chunk,
         CAST(ROUND(CAST(dense_hits AS DOUBLE) / n_truth * 1000000000, 0)
              AS BIGINT) AS rd_nano,
         CAST(ROUND(CAST(hybrid_hits AS DOUBLE) / n_truth * 1000000000, 0)
              AS BIGINT) AS rh_nano
  FROM hits
)
SELECT q_doc, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       ROUND(CAST(SUM(rd_nano) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6)
         AS recall_dense_at{_RC_K},
       ROUND(CAST(SUM(rh_nano) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6)
         AS recall_hybrid_at{_RC_K}
FROM per_chunk
GROUP BY q_doc
ORDER BY q_doc
""",
)
def eval_rag_retrieval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRIEVAL-QUALITY panel for the RAG stack: per query document,
    recall@{k} of the DENSE hashed-vector leg and of the HYBRID RRF
    list against the exact sparse-cosine top-{k} baseline (the
    retrieval family's reference ranking) — the eval a pipeline runs
    before swapping retriever legs, quantifying what the hashing trick
    loses and what the fusion buys back, per document.

    ORACLE-EXACT end to end: every list derives from the same
    BIGINT-dot-product + 6-dp-cosine + full-tiebreak rankings the
    hybrid query pins; per-chunk recalls are nano-quantized BEFORE the
    per-document mean so the mean is an exact integer sum with ONE
    double division (no float summation-order hazard).

    Scale shape: ONE chunk+shingle pass feeds truth, dense and hybrid —
    the two depth-10 leg rankings come from the SESSION-memoized
    ``_hybrid_legs_for`` store (r7 verdict action #2), shared with the
    hybrid query and the MRR/MAP panel, and every panel frame (truth =
    sparse top-{k}, dense top-{k}, hybrid fusion) is a filter or a
    depth-bounded join over them, so nothing corpus-sized runs twice
    within the query OR across the retrieval-eval family; output is
    |query docs| rows."""
    sparse, dense = _hybrid_legs_for(spark, sf_dir)
    fused = _rrf_fuse(sparse, dense, out_depth=_RC_K)
    # leg ranks and the panel's recall-depth cuts share one window
    # order (cosine desc, c_doc, c_chunk), so top-k IS rank ≤ k
    truth = sparse.filter(F.col("s_rnk") <= _RC_K).drop("s_rnk")
    dense5 = dense.filter(F.col("d_rnk") <= _RC_K).drop("d_rnk")
    hybrid5 = fused.select("q_doc", "q_chunk", "c_doc", "c_chunk")
    keys = ["q_doc", "q_chunk", "c_doc", "c_chunk"]
    truth_n = truth.groupBy("q_doc", "q_chunk").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    hits = (
        truth.join(
            dense5.withColumn("_d", F.lit(1)), keys, "left"
        )
        .join(hybrid5.withColumn("_h", F.lit(1)), keys, "left")
        .groupBy("q_doc", "q_chunk")
        .agg(
            F.count(F.col("_d")).cast("long").alias("dense_hits"),
            F.count(F.col("_h")).cast("long").alias("hybrid_hits"),
        )
        .join(truth_n, ["q_doc", "q_chunk"])
    )
    per_chunk = hits.select(
        "q_doc",
        "q_chunk",
        F.round(
            F.col("dense_hits").cast("double") / F.col("n_truth")
            * 1_000_000_000,
            0,
        )
        .cast("long")
        .alias("rd_nano"),
        F.round(
            F.col("hybrid_hits").cast("double") / F.col("n_truth")
            * 1_000_000_000,
            0,
        )
        .cast("long")
        .alias("rh_nano"),
    )
    return (
        per_chunk.groupBy("q_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.round(
                F.sum("rd_nano").cast("double")
                / (F.count(F.lit(1)) * 1_000_000_000.0),
                6,
            ).alias(f"recall_dense_at{_RC_K}"),
            F.round(
                F.sum("rh_nano").cast("double")
                / (F.count(F.lit(1)) * 1_000_000_000.0),
                6,
            ).alias(f"recall_hybrid_at{_RC_K}"),
        )
        .orderBy("q_doc")
    )


eval_rag_retrieval_recall.__doc__ = eval_rag_retrieval_recall.__doc__.format(
    k=_RC_K
)


# -------------------------------------------------- MRR / MAP eval


@register(
    "eval_retrieval_mrr_map",
    tags=("llm", "chunking", "retrieval", "eval", "mrr", "map", "rag"),
    oracle=f"""
WITH {_SQL_CHUNKS},
ctoks AS (
  SELECT doc_id, chunk_id,
         {_SQL_TOKS.replace('text', 'chunk_text')} AS t
  FROM chunks
),
sh_all AS (
  SELECT doc_id, chunk_id, unnest(
    CASE WHEN len(t) >= {SHINGLE_K} THEN list_distinct(
           list_transform(generate_series(1, len(t) - {SHINGLE_K - 1}),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END) AS term
  FROM ctoks
),
tf AS (
  SELECT doc_id, chunk_id, term FROM sh_all WHERE len(term) > 0
),
df AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= {MAX_DF}
),
tf2 AS (SELECT tf.* FROM tf JOIN df USING (term)),
nrm AS (
  SELECT doc_id, chunk_id, SQRT(CAST(COUNT(*) AS DOUBLE)) AS nn
  FROM tf2 GROUP BY doc_id, chunk_id
),
dots AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(COUNT(*) AS BIGINT) AS dp
  FROM tf2 q JOIN tf2 c USING (term)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
sparse AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM dots d
    JOIN nrm nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN nrm nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_RC_K}
),
hb AS (
  SELECT doc_id, chunk_id,
         CAST({_SQL_HASH60} % {HASH_DIM} AS INTEGER) AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tf GROUP BY 1, 2, 3
),
hn AS (
  SELECT doc_id, chunk_id,
         SQRT(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nn
  FROM hb GROUP BY 1, 2
),
hd AS (
  SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
         c.doc_id AS c_doc, c.chunk_id AS c_chunk,
         CAST(SUM(q.cnt * c.cnt) AS BIGINT) AS dp
  FROM hb q JOIN hb c USING (b)
  WHERE q.doc_id < {N_QUERY_DOCS} AND c.doc_id >= {N_QUERY_DOCS}
  GROUP BY 1, 2, 3, 4
),
dense AS (
  SELECT q_doc, q_chunk, c_doc, c_chunk, rnk FROM (
    SELECT d.q_doc, d.q_chunk, d.c_doc, d.c_chunk,
           ROW_NUMBER() OVER (
             PARTITION BY d.q_doc, d.q_chunk
             ORDER BY ROUND(CAST(d.dp AS DOUBLE) / (nq.nn * nc.nn), 6)
                        DESC, d.c_doc, d.c_chunk) AS rnk
    FROM hd d
    JOIN hn nq ON nq.doc_id = d.q_doc AND nq.chunk_id = d.q_chunk
    JOIN hn nc ON nc.doc_id = d.c_doc AND nc.chunk_id = d.c_chunk
  ) WHERE rnk <= {_HY_DEPTH}
),
truth_n AS (
  SELECT q_doc, q_chunk, CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM sparse GROUP BY q_doc, q_chunk
),
matches AS (
  SELECT s.q_doc, s.q_chunk, d.rnk
  FROM sparse s JOIN dense d
    ON d.q_doc = s.q_doc AND d.q_chunk = s.q_chunk
   AND d.c_doc = s.c_doc AND d.c_chunk = s.c_chunk
),
mrr AS (
  SELECT q_doc, q_chunk, MIN(rnk) AS first_rnk
  FROM matches GROUP BY 1, 2
),
prec AS (
  SELECT q_doc, q_chunk, rnk,
         ROW_NUMBER() OVER (PARTITION BY q_doc, q_chunk ORDER BY rnk)
           AS hit_no
  FROM matches
),
ap AS (
  SELECT q_doc, q_chunk,
         CAST(SUM(CAST(ROUND(hit_no::DOUBLE / rnk * 1000000000, 0)
                       AS BIGINT)) AS BIGINT) AS prec_nano
  FROM prec GROUP BY 1, 2
),
per_chunk AS (
  SELECT t.q_doc, t.q_chunk,
         COALESCE(CAST(ROUND(1000000000.0 / m.first_rnk, 0) AS BIGINT), 0)
           AS mrr_nano,
         CAST(ROUND(COALESCE(a.prec_nano, 0)::DOUBLE / t.n_truth, 0)
              AS BIGINT) AS ap_nano
  FROM truth_n t
  LEFT JOIN mrr m ON m.q_doc = t.q_doc AND m.q_chunk = t.q_chunk
  LEFT JOIN ap a ON a.q_doc = t.q_doc AND a.q_chunk = t.q_chunk
)
SELECT q_doc, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       ROUND(CAST(SUM(mrr_nano) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6)
         AS mrr_at{_HY_DEPTH},
       ROUND(CAST(SUM(ap_nano) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6)
         AS map_at{_HY_DEPTH}
FROM per_chunk
GROUP BY q_doc
ORDER BY q_doc
""",
)
def eval_retrieval_mrr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR / MAP for the dense retrieval leg — the rank-POSITION
    companions to ``eval_rag_retrieval_recall`` (recall says whether
    truth items appear in the candidate list; MRR says how FAST the
    first one appears, MAP how well the whole truth set is ordered):
    per query chunk, truth = the exact sparse-cosine top-5, candidates
    = the dense hashed-vector depth-10 ranking; MRR@10 = 1/rank of the
    first truth hit (0 if none), AP@10 = mean over truth items of
    precision-at-their-rank; both averaged to the query-DOCUMENT grain.

    Exactness: both rankings are the staged ``_hybrid_legs`` lists
    (BIGINT dots, 6-dp cosines, full tiebreaks); every per-chunk
    reciprocal/precision term is nano-quantized BEFORE any multi-row
    sum, so the per-document means are exact integer sums with one
    final double division each.

    Scale shape: identical economics to the recall panel — the staged
    legs come from the SESSION-memoized ``_hybrid_legs_for`` store
    (shared with the hybrid query and the recall panel), then joins on
    depth-bounded per-chunk lists; output is |query docs| rows."""
    sparse, dense = _hybrid_legs_for(spark, sf_dir)
    keys = ["q_doc", "q_chunk", "c_doc", "c_chunk"]
    truth = sparse.filter(F.col("s_rnk") <= _RC_K).drop("s_rnk")
    truth_n = truth.groupBy("q_doc", "q_chunk").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    matches = truth.join(dense, keys).select(
        "q_doc", "q_chunk", F.col("d_rnk").alias("rnk")
    )
    mrr = matches.groupBy("q_doc", "q_chunk").agg(
        F.min("rnk").alias("first_rnk")
    )
    w_hit = Window.partitionBy("q_doc", "q_chunk").orderBy("rnk")
    ap = (
        matches.withColumn("hit_no", F.row_number().over(w_hit))
        .groupBy("q_doc", "q_chunk")
        .agg(
            F.sum(
                F.round(
                    F.col("hit_no").cast("double")
                    / F.col("rnk")
                    * 1_000_000_000,
                    0,
                ).cast("long")
            )
            .cast("long")
            .alias("prec_nano")
        )
    )
    per_chunk = (
        truth_n.join(mrr, ["q_doc", "q_chunk"], "left")
        .join(ap, ["q_doc", "q_chunk"], "left")
        .select(
            "q_doc",
            "q_chunk",
            F.coalesce(
                F.round(
                    F.lit(1_000_000_000.0) / F.col("first_rnk"), 0
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("mrr_nano"),
            F.round(
                F.coalesce(F.col("prec_nano"), F.lit(0)).cast("double")
                / F.col("n_truth"),
                0,
            )
            .cast("long")
            .alias("ap_nano"),
        )
    )
    return (
        per_chunk.groupBy("q_doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.round(
                F.sum("mrr_nano").cast("double")
                / (F.count(F.lit(1)) * 1_000_000_000.0),
                6,
            ).alias(f"mrr_at{_HY_DEPTH}"),
            F.round(
                F.sum("ap_nano").cast("double")
                / (F.count(F.lit(1)) * 1_000_000_000.0),
                6,
            ).alias(f"map_at{_HY_DEPTH}"),
        )
        .orderBy("q_doc")
    )
