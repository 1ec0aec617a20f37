"""MaxScore-pruned BM25: result-invariance vs the full scan, bound
validity (the exactness crux), and the measured candidate-reduction
ratio the query docstring claims.
"""

from __future__ import annotations

import math

import pandas as pd

from stock_data_warehouse_analytics_spark.plans.retrieval import (
    _B,
    _K1,
    _QUERY_TERMS,
    text_bm25_topk,
    text_bm25_topk_maxscore,
)

from .conftest import SF_MEDIUM, SF_SMALL


def _rows(df):
    return [
        (r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in df.collect()
    ]


def test_maxscore_identical_to_full_scan(spark):
    for sf in (SF_SMALL, SF_MEDIUM):
        full = _rows(text_bm25_topk(spark, sf))
        pruned = _rows(text_bm25_topk_maxscore(spark, sf))
        assert pruned == full, sf


def _pandas_bm25(sf_dir: str):
    """Independent dict-based BM25 + upper bounds over the raw parquet:
    returns (per-doc true totals, per-doc ub totals, per-doc n_terms)."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {
        r.doc_id: str(r.text).strip().lower().split()
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, t in toks.items():
        for w in t:
            if w in _QUERY_TERMS:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict[str, int] = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    true_tot: dict[int, float] = {}
    ub_tot: dict[int, float] = {}
    n_terms: dict[int, int] = {}
    for (d, w), f in tf.items():
        idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
        dl = len(toks[d])
        true = idf * (f * (_K1 + 1.0)) / (
            f + _K1 * ((1.0 - _B) + _B * (dl / avgdl))
        )
        ub = idf * (f * (_K1 + 1.0)) / (f + _K1 * (1.0 - _B))
        true_tot[d] = true_tot.get(d, 0.0) + true
        ub_tot[d] = ub_tot.get(d, 0.0) + ub
        n_terms[d] = n_terms.get(d, 0) + 1
    return true_tot, ub_tot, n_terms


def test_maxscore_bound_validity_and_reduction(spark):
    """The dl-free upper bound must dominate the true per-doc score for
    EVERY matched document (otherwise pruning could drop a top-20 doc),
    and at sf0.01 the θ-filter must actually reduce the scoring set —
    the measured ratio recorded in PERF.md."""
    true_tot, ub_tot, n_terms = _pandas_bm25(SF_MEDIUM)
    assert true_tot, "query terms must hit the corpus"
    for d, s in true_tot.items():
        assert ub_tot[d] >= s - 1e-12, d

    seeds = sorted(
        (s for d, s in true_tot.items() if n_terms[d] >= 2), reverse=True
    )
    if len(seeds) < 20:
        return  # θ cannot be established — pruning legitimately off
    theta = seeds[19]
    survivors = [d for d in true_tot if ub_tot[d] >= theta]
    top20 = sorted(true_tot, key=lambda d: (-true_tot[d], d))[:20]
    # exactness: every true top-20 doc survives the prune
    assert set(top20) <= set(survivors)
    # effectiveness: the prune drops a real fraction of candidates
    ratio = len(survivors) / len(true_tot)
    assert ratio < 1.0, (len(survivors), len(true_tot))
    print(
        f"maxscore reduction sf0.01: {len(survivors)}/{len(true_tot)}"
        f" = {ratio:.3f}"
    )
