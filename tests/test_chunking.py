"""Chunking operator contracts: boundary arithmetic, coverage,
overlap, text reconstruction, and edge cases (empty / NULL / short
documents).  The three registered chunk queries are additionally
oracle-checked in test_queries_oracle.py like every other query."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_warehouse_analytics_spark.operators.chunking import (
    chunk_documents,
    chunk_term_counts,
)
from stock_data_warehouse_analytics_spark.sources.tables import load_table

from .conftest import SF_SMALL


def test_chunk_boundaries_and_reconstruction(spark):
    """Per document: starts are exactly 0, stride, 2·stride, … < n;
    half-open windows cover [0, n) with the configured overlap; each
    chunk_text equals the joined token slice (driver-side recompute)."""
    chunk_tokens, overlap = 16, 4
    stride = chunk_tokens - overlap
    d = load_table(spark, SF_SMALL, "documents")
    rows = chunk_documents(
        d, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    texts = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    assert set(by_doc) == set(texts)  # every doc chunked (none empty)
    for doc_id, chs in by_doc.items():
        toks = (texts[doc_id] or "").strip().lower().split()
        if not toks:
            toks = [""]  # split('') → [''] on both engines
        n = len(toks)
        chs.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in chs] == list(range(len(chs)))
        assert [r.start_tok for r in chs] == [
            i * stride for i in range(len(chs))
        ]
        assert all(r.start_tok < n for r in chs)
        # next start would be >= n: no missing tail chunk
        assert len(chs) * stride >= n or len(chs) == (n - 1) // stride + 1
        for r in chs:
            assert r.end_tok == min(r.start_tok + chunk_tokens, n)
            assert r.n_tokens == r.end_tok - r.start_tok
            assert r.chunk_text == " ".join(toks[r.start_tok : r.end_tok])
        assert chs[-1].end_tok == n  # full coverage
        for a, b in zip(chs, chs[1:]):
            got_overlap = a.end_tok - b.start_tok
            if a.end_tok == a.start_tok + chunk_tokens:  # full-width chunk
                assert got_overlap == overlap
            else:  # truncated non-final chunk: still a positive overlap
                assert 1 <= got_overlap < overlap


def test_chunk_edge_cases(spark):
    """Empty string (tokenizes to ['']) yields exactly one 1-token
    chunk; NULL text yields no chunks; a doc shorter than one window
    yields one short chunk; overlap ≥ chunk_tokens raises."""
    import pytest

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "alpha beta"), (4, "   ")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in chunk_documents(df, chunk_tokens=16, overlap=4).collect()
    }
    assert set(got) == {1, 3, 4}  # NULL dropped
    assert (got[1].start_tok, got[1].end_tok, got[1].chunk_text) == (0, 1, "")
    assert (got[3].n_tokens, got[3].chunk_text) == (2, "alpha beta")
    assert got[4].chunk_text == ""  # whitespace-only trims to ''

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunk_term_counts_conserve_tokens(spark):
    """The sparse TF table conserves the token stream: summed counts
    per chunk equal the chunk's non-empty token count."""
    d = load_table(spark, SF_SMALL, "documents").limit(50)
    ch = chunk_documents(d, chunk_tokens=16, overlap=4)
    tf = chunk_term_counts(ch)
    got = {
        (r.doc_id, r.chunk_id): r.s
        for r in tf.groupBy("doc_id", "chunk_id")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    want = {
        (r.doc_id, r.chunk_id): r.n
        for r in ch.select(
            "doc_id",
            "chunk_id",
            F.size(
                F.filter(
                    F.split(F.lower(F.trim(F.col("chunk_text"))), r"\s+"),
                    lambda t: F.length(t) > 0,
                )
            ).alias("n"),
        ).collect()
        if r.n > 0
    }
    assert got == want


def test_chunk_ann_lsh_recall(spark):
    """Substitute check for rows-only ``chunk_ann_lsh_topk``: on the
    SAME hashed chunk vectors, the LSH top-k must recover a solid
    fraction of the exact brute-force top-k (recall ≥ 0.5 at these
    settings — LSH trades recall for the signature prefilter), every
    returned cosine must equal the brute-force cosine for that pair,
    and the query is deterministic across two runs."""
    from stock_data_warehouse_analytics_spark.plans.chunking import (
        chunk_hashed_vectors,
        N_QUERY_DOCS,
        CHUNK_KEY_MUL,
        TOPK,
    )
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
    )
    from stock_data_warehouse_analytics_spark.plans.registry import QUERIES

    vecs = chunk_hashed_vectors(spark, SF_SMALL).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("chunk_key") < N_QUERY_DOCS * CHUNK_KEY_MUL)
    brute = topk_bruteforce(
        vecs, queries, k=TOPK, id_col="chunk_key"
    ).collect()
    exact = {}
    exact_cos = {}
    for r in brute:
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
        exact_cos[(r.query_id, r.neighbor_id)] = r.cosine

    got1 = QUERIES["chunk_ann_lsh_topk"].fn(spark, SF_SMALL).collect()
    got2 = QUERIES["chunk_ann_lsh_topk"].fn(spark, SF_SMALL).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in got2]

    hits = tot = 0
    for r in got1:
        if r.neighbor_id in exact.get(r.query_id, set()):
            hits += 1
        tot += 1
        # any pair also present in the brute top-k must agree on cosine
        if (r.query_id, r.neighbor_id) in exact_cos:
            assert abs(exact_cos[(r.query_id, r.neighbor_id)] - r.cosine) < 2e-6
    assert tot > 0
    assert hits / max(
        1, sum(len(v) for v in exact.values())
    ) >= 0.5, (hits, exact)


def test_chunk_hybrid_lsh_leg_recall(spark):
    """The scale-path swap the hybrid query's docstring names: replacing
    the exact dense leg with the LSH-bucketed leg (chunk_ann_lsh_topk's
    operator at the fusion depth) must recover a solid fraction of the
    exact dense leg's candidates on the SAME hashed vectors — the
    measured leg-level recall that bounds how much the fused list can
    drift at scale."""
    from stock_data_warehouse_analytics_spark.plans.chunking import (
        CHUNK_KEY_MUL,
        HASH_DIM,
        N_QUERY_DOCS,
        _HY_DEPTH,
        chunk_hashed_vectors,
    )
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_lsh,
    )

    vecs = chunk_hashed_vectors(spark, SF_SMALL).localCheckpoint(eager=True)
    queries = vecs.filter(F.col("chunk_key") < N_QUERY_DOCS * CHUNK_KEY_MUL)
    exact = {}
    for r in topk_bruteforce(
        vecs, queries, k=_HY_DEPTH, id_col="chunk_key"
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in topk_lsh(
        vecs,
        queries,
        k=_HY_DEPTH,
        dim=HASH_DIM,
        n_planes=16,
        max_hamming=6,
        id_col="chunk_key",
        fast=True,
    ).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    tot = sum(len(exact[q]) for q in exact)
    recall = hits / tot
    assert recall >= 0.5, recall
    print(f"chunk hybrid dense-leg LSH recall@{_HY_DEPTH}: {recall:.3f}")


def test_compression_quality_matches_zlib(spark):
    """Same-library differential for the rows-only compression signal:
    re-derive every per-source row with direct zlib + pure pandas
    (certifies the Spark plumbing — Arrow batching, nano quantization,
    aggregation — since the DEFLATE byte count itself has no
    independent mirror)."""
    import zlib

    import pandas as pd

    from stock_data_warehouse_analytics_spark.plans.corpus_signals import (
        _CQ_FLAG,
        _CQ_LEVEL,
        text_compression_quality,
    )
    from tests.conftest import SF_SMALL

    got = {
        r.source: (r.n_docs, r.mean_ratio, r.n_flagged, r.flag_share)
        for r in text_compression_quality(spark, SF_SMALL).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    nano = {}
    for src, text in zip(pdf["source"], pdf["text"]):
        t = text.encode("utf-8")
        n = round(len(zlib.compress(t, _CQ_LEVEL)) / max(len(t), 1) * 1e9)
        nano.setdefault(src, []).append(n)
    assert set(got) == set(nano)
    for src, ns in nano.items():
        flagged = sum(1 for n in ns if n < int(_CQ_FLAG * 1e9))
        want = (
            len(ns),
            round(sum(ns) / (len(ns) * 1e9), 6),
            flagged,
            round(flagged / len(ns), 6),
        )
        assert got[src] == want, src
    # the signal must vary (not all sources identical)
    assert len({v[1] for v in got.values()}) > 1
