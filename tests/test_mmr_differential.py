"""Differential test: sim_mmr_diversify's greedy MMR trajectory vs an
independent numpy re-derivation from the raw embeddings parquet — the
substitute check for the rows-only registry entry (iterative argmax is
not SQL-expressible).

The re-derivation mirrors the REGISTERED semantics, not the code:
candidates = top-50 by round(cosine, 6) with neighbor_id tiebreak
(query vec_id 0, self excluded), then greedy λ·rel − (1−λ)·max-sim
selection with first-max-wins ties.  Scores are compared at 1e-9 —
well inside the 1e-6 quantization the query emits, while allowing the
JVM-left-fold vs numpy-BLAS dot summation-order residue."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMALL

LAM = 0.7
K = 10
N_CAND = 50


def _numpy_mmr(sf_dir: str):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    Vn = V / np.sqrt((V * V).sum(axis=1))[:, None]
    q = Vn[ids == 0][0]
    cos = Vn @ q
    # candidate cut exactly as registered: round-6 desc, id tiebreak
    order = sorted(
        (i for i in range(len(ids)) if ids[i] != 0),
        key=lambda i: (-round(float(cos[i]), 6), ids[i]),
    )[:N_CAND]
    # greedy over candidates sorted by neighbor_id (the UDF's frame)
    cand = sorted(order, key=lambda i: ids[i])
    rel = {i: float(Vn[i] @ q) for i in cand}
    picked: list[int] = []
    max_sim = {i: 0.0 for i in cand}
    out = []
    for step in range(1, min(K, len(cand)) + 1):
        best, best_score = None, None
        for i in cand:
            if i in picked:
                continue
            s = LAM * rel[i] - (1.0 - LAM) * max_sim[i]
            if best is None or s > best_score:
                best, best_score = i, s
        out.append(
            (step, int(ids[best]), int(labels[best]), rel[best], best_score)
        )
        picked.append(best)
        for i in cand:
            s = float(Vn[i] @ Vn[best])
            if s > max_sim[i]:
                max_sim[i] = s
    return out


def test_mmr_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.llm_similarity import (
        sim_mmr_diversify,
    )

    got = sim_mmr_diversify(spark, SF_SMALL).collect()
    want = _numpy_mmr(SF_SMALL)
    assert len(got) == len(want) == K
    for row, (step, vid, label, rel, score) in zip(got, want):
        assert row["rank"] == step
        assert row["vec_id"] == vid, (step, row["vec_id"], vid)
        assert row["label"] == label
        # the query emits round(x, 6): half-ulp of the quantization,
        # plus the summation-order residue covered at 1e-9
        assert row["relevance"] == pytest.approx(rel, abs=5.01e-7)
        assert row["mmr_score"] == pytest.approx(score, abs=5.01e-7)


def test_mmr_selection_is_diverse(spark):
    """The point of MMR: the selected set's max pairwise similarity
    must not exceed the raw top-10's (diversity never hurts), and the
    first pick must be the single most relevant candidate."""
    from stock_data_warehouse_analytics_spark.plans.llm_similarity import (
        sim_mmr_diversify,
    )

    pdf = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    Vn = V / np.sqrt((V * V).sum(axis=1))[:, None]
    q = Vn[ids == 0][0]
    cos = Vn @ q
    order = sorted(
        (i for i in range(len(ids)) if ids[i] != 0),
        key=lambda i: (-round(float(cos[i]), 6), ids[i]),
    )
    got = sim_mmr_diversify(spark, SF_SMALL).collect()
    sel = [r["vec_id"] for r in got]
    top1 = int(ids[order[0]])
    assert sel[0] == top1

    def max_pairwise(vids):
        idx = [int(np.flatnonzero(ids == v)[0]) for v in vids]
        M = Vn[idx] @ Vn[idx].T
        np.fill_diagonal(M, -np.inf)
        return float(M.max())

    raw10 = [int(ids[i]) for i in order[:K]]
    assert max_pairwise(sel) <= max_pairwise(raw10) + 1e-12
