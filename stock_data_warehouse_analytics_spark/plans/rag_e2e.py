"""The END-TO-END RAG ingest-and-retrieve showpiece: ONE registered
composition running every stage a production retrieval pipeline runs —

    chunk → cross-doc chunk dedup → hybrid (sparse+dense) retrieval
          → RRF fusion → MMR diversification → context-window packing

— all stages reusing the already-verified building blocks:
``operators/chunking.py`` (chunk table), the ``chunk_crossdoc_duplicates``
dedup convention, the ``hybrid_fused_candidates`` retriever core (whose
plan is oracle-pinned by ``chunk_hybrid_rrf_topk``), the
``hashed_chunk_vectors`` lexical embeddings, the ``sim_mmr_diversify``
greedy-MMR stance, and a next-fit token-budget packer.

Rows-only by design (greedy MMR + next-fit packing are iterative);
semantics pinned END TO END by the independent differential
tests/test_rag_e2e.py::test_rag_e2e_matches_duckdb_numpy, which
re-derives the fused candidate sets with DuckDB SQL and replays the
MMR + packing tail in pure numpy from the raw parquet.

Reference scope: no counterpart in the reference engine — the
LLM-pipeline extension surface's capstone composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from ..sources.tables import load_table
from .chunking import (
    CHUNK_KEY_MUL,
    CHUNK_TOKENS,
    N_QUERY_DOCS,
    OVERLAP,
    _chunk_tf_for,
    _legs_from_tf,
    _rrf_fuse,
    hashed_chunk_vectors,
)
from .registry import register

_RAG_FUSED = 10  # fused candidates per query chunk fed into MMR
_RAG_MMR_K = 5  # diversified context chunks kept per query chunk
_RAG_LAMBDA = 0.7  # MMR relevance weight (sim_mmr_diversify's literal)
_RAG_CTX_TOKENS = 48  # context-window token budget for the packer


def _dup_chunk_keys(ch: DataFrame) -> DataFrame:
    """(doc_id, chunk_id) of the NON-CANONICAL cross-doc duplicate
    chunks: among full-width corpus chunks with byte-identical text,
    every copy except the (doc_id, chunk_id)-minimal one.  One md5
    hash-groupBy shuffle, linear in corpus size; output is
    duplicate-grain (small)."""
    full = ch.filter(
        (F.col("doc_id") >= N_QUERY_DOCS)
        & (F.col("n_tokens") == CHUNK_TOKENS)
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy("doc_id", "chunk_id")
    return (
        full.withColumn("occ", F.row_number().over(w))
        .filter(F.col("occ") > 1)
        .select("doc_id", "chunk_id")
    )


def dedup_chunk_table(ch: DataFrame, dup: DataFrame | None = None) -> DataFrame:
    """Drop NON-CANONICAL cross-doc duplicate chunks from the corpus
    side before indexing — the ``chunk_crossdoc_duplicates`` convention
    made into a filter: among full-width corpus chunks with
    byte-identical text, the (doc_id, chunk_id)-minimal copy survives;
    query-document chunks are never dropped.  ``dup`` — pass a
    pre-materialized :func:`_dup_chunk_keys` frame to share the md5
    window across consumers (r10)."""
    if dup is None:
        dup = _dup_chunk_keys(ch)
    return ch.join(dup, ["doc_id", "chunk_id"], "left_anti")


@register(
    "rag_pipeline_end2end",
    tags=("llm", "rag", "chunking", "retrieval", "mmr", "dedup", "e2e"),
    oracle=None,  # greedy MMR + next-fit packing are iterative —
    # rows-only; the full composition is pinned by the independent
    # DuckDB+numpy differential
    # tests/test_rag_e2e.py::test_rag_e2e_matches_duckdb_numpy and the
    # rows-only contract test's schema/rowcount pin.
)
def rag_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END RAG retrieval: for every chunk of the query documents
    (doc_id < N_QUERY_DOCS), retrieve hybrid-fused candidates from the
    DEDUPED corpus chunk index (top _RAG_FUSED = 10 by RRF over the
    sparse shingle-cosine and dense hashed-vector legs), diversify to
    _RAG_MMR_K = 5 with greedy MMR (λ = 0.7; relevance = RRF score
    normalized to the candidate set's max, diversity = cosine over the
    deterministic hashed chunk vectors), then pack the selected chunks
    of each query DOCUMENT into context windows of ≤ _RAG_CTX_TOKENS =
    48 tokens (next-fit in (q_chunk, mmr_rank) order, each distinct
    corpus chunk admitted once per query document — a context should
    never repeat a passage).  Rows-only by design (greedy MMR and the
    packer are iterative); the FULL composition is pinned by the
    independent DuckDB+numpy differential
    tests/test_rag_e2e.py::test_rag_e2e_matches_duckdb_numpy.

    Determinism: every upstream stage is the oracle-pinned exact plan;
    inside the Arrow task candidates are pre-sorted by (q_chunk,
    rrf_rank) and numpy argmax takes the FIRST max, so MMR ties break
    toward the better fused rank; zero-norm vectors contribute
    similarity 0.

    Scale shape: chunking/dedup/retrieval/fusion distribute exactly as
    their standalone queries (one chunk+shingle pass feeds both legs;
    the dedup is one md5-key shuffle); the iterative MMR + packing tail
    runs in ONE applyInPandas task per QUERY DOCUMENT over a frame
    bounded at chunks(q_doc) × _RAG_FUSED rows — never corpus-sized —
    so a batch of query docs fans out one bounded task each."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(
        d, chunk_tokens=CHUNK_TOKENS, overlap=OVERLAP, keep_text=True
    )
    # duplicate keys materialized ONCE (duplicate-grain, small): they
    # filter both the chunk table below and the staged tf substrate
    dup = _dup_chunk_keys(ch).localCheckpoint(eager=True)
    # consumed by THREE stages (retriever core, vector build, token
    # join) — stage the deduped chunk table once, the round-6 staged-
    # frame discipline (ROUND_NOTES session-2)
    ch2 = dedup_chunk_table(ch, dup=dup).localCheckpoint(eager=True)
    # r10: the retriever legs start from the SESSION-STAGED standard
    # chunk+shingle tf (`_chunk_tf_for`) minus the duplicate chunks —
    # row-identical to exploding the deduped chunk table (shingles are
    # chunk-local, so dropping a chunk drops exactly its tf rows; rag
    # uses the same CHUNK_TOKENS/OVERLAP/SHINGLE_K constants), which
    # removes the per-invocation corpus explode + checkpoint the
    # retriever core paid (guide §2.4; measured 6.3 → ~4.2 s steady).
    # The dedup-before-census semantics are intact: the df census and
    # both legs are computed on the anti-joined tf.  No checkpoint on
    # the tf: its upstream is a checkpoint scan + a small-broadcast
    # anti-join, cheap for each of the five leg branches (the explode
    # it replaces was the expensive re-run).
    tf_dedup = _chunk_tf_for(spark, sf_dir).join(
        dup, ["doc_id", "chunk_id"], "left_anti"
    )
    sparse_leg, dense_leg = _legs_from_tf(tf_dedup, leg_depth=_RAG_FUSED)
    # staged: consumed by the candidate-key semi-join AND the final
    # cand join — without this the whole two-leg retriever runs twice
    fused = _rrf_fuse(
        sparse_leg, dense_leg, out_depth=_RAG_FUSED
    ).localCheckpoint(eager=True)
    # vector/token work is QUERY-sized, not corpus-sized: only the
    # fused candidates (≤ query-chunks × _RAG_FUSED rows) ever reach
    # the MMR stage, so restrict the chunk table BEFORE the densify —
    # the ×10 growth point dropped from 9.5× (corpus-linear) to the
    # retriever core's own curve once this semi-join landed (PERF §7)
    cand_keys = fused.select(
        F.col("c_doc").alias("doc_id"), F.col("c_chunk").alias("chunk_id")
    ).distinct()
    ch_cand = ch2.join(cand_keys, ["doc_id", "chunk_id"], "left_semi")
    vec = hashed_chunk_vectors(ch_cand).select(
        F.col("chunk_key"), F.col("embedding").alias("emb")
    )
    toks = ch_cand.select(
        F.col("doc_id").alias("c_doc"),
        F.col("chunk_id").alias("c_chunk"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
    )
    cand = (
        fused.join(toks, ["c_doc", "c_chunk"])
        .withColumn(
            "chunk_key",
            F.col("c_doc") * CHUNK_KEY_MUL + F.col("c_chunk"),
        )
        .join(vec, "chunk_key")
        .select(
            F.col("q_doc").cast("long"),
            F.col("q_chunk").cast("long"),
            F.col("c_doc").cast("long"),
            F.col("c_chunk").cast("long"),
            F.col("rrf_rank").cast("int"),
            F.col("rrf_score").cast("double"),
            "n_tokens",
            "emb",
        )
    )

    def mmr_pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        selected = []  # (q_chunk, mmr_rank, row)
        for q_chunk, grp in pdf.groupby("q_chunk", sort=True):
            grp = grp.sort_values("rrf_rank").reset_index(drop=True)
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in grp["emb"]]
            )
            nrm = np.sqrt((V * V).sum(axis=1))
            nrm[nrm == 0.0] = 1.0
            Vn = V / nrm[:, None]
            S = Vn @ Vn.T
            rel = grp["rrf_score"].to_numpy(dtype=np.float64)
            reln = rel / rel.max()
            n = len(grp)
            max_sim = np.zeros(n)
            picked = np.zeros(n, dtype=bool)
            for step in range(1, min(_RAG_MMR_K, n) + 1):
                score = _RAG_LAMBDA * reln - (1.0 - _RAG_LAMBDA) * max_sim
                score[picked] = -np.inf
                i = int(np.argmax(score))
                selected.append(
                    (
                        int(q_chunk),
                        step,
                        int(grp["c_doc"].iloc[i]),
                        int(grp["c_chunk"].iloc[i]),
                        int(grp["n_tokens"].iloc[i]),
                        float(grp["rrf_score"].iloc[i]),
                        round(float(score[i]), 6),
                    )
                )
                picked[i] = True
                max_sim = np.maximum(max_sim, S[:, i])
        # next-fit packing in (q_chunk, mmr_rank) order; each corpus
        # chunk at most once per query doc
        q_doc = int(pdf["q_doc"].iloc[0])
        seen: set[tuple[int, int]] = set()
        out = []
        ctx, pos, cum = 0, 0, 0
        for q_chunk, step, c_doc, c_chunk, nt, rrf, mmr in selected:
            key = (c_doc, c_chunk)
            if key in seen:
                continue
            seen.add(key)
            if pos > 0 and cum + nt > _RAG_CTX_TOKENS:
                ctx, pos, cum = ctx + 1, 0, 0
            pos += 1
            cum += nt
            out.append(
                (q_doc, ctx, pos, q_chunk, step, c_doc, c_chunk, nt, cum,
                 rrf, mmr)
            )
        return pd.DataFrame(
            out,
            columns=[
                "q_doc",
                "ctx_window",
                "position",
                "q_chunk",
                "mmr_rank",
                "c_doc",
                "c_chunk",
                "n_tokens",
                "cum_tokens",
                "rrf_score",
                "mmr_score",
            ],
        )

    schema = (
        "q_doc bigint, ctx_window int, position int, q_chunk bigint,"
        " mmr_rank int, c_doc bigint, c_chunk bigint, n_tokens int,"
        " cum_tokens int, rrf_score double, mmr_score double"
    )
    return (
        cand.groupBy("q_doc")
        .applyInPandas(mmr_pack, schema)
        .orderBy("q_doc", "ctx_window", "position")
    )
