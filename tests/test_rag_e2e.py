"""Independent end-to-end differential for ``rag_pipeline_end2end``:
DuckDB re-derives the deduped chunk table, both retrieval legs and the
RRF fusion straight from the raw parquet (SQL adapted from the
oracle-pinned ``chunk_hybrid_rrf_topk`` text, with the dedup CTE
inserted and the fused cut at the e2e depth), then pure numpy replays
the greedy MMR and the next-fit context packer.  The Spark composition
must reproduce every row."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from stock_data_warehouse_analytics_spark.plans.chunking import (
    CHUNK_TOKENS,
    HASH_DIM,
    MAX_DF,
    N_QUERY_DOCS,
    SHINGLE_K,
    _HY_K,
    _SQL_CHUNKS,
    _SQL_HASH60,
    _SQL_TOKS,
)
from stock_data_warehouse_analytics_spark.plans.rag_e2e import (
    _RAG_CTX_TOKENS,
    _RAG_FUSED,
    _RAG_LAMBDA,
    _RAG_MMR_K,
    rag_pipeline_end2end,
)

from .conftest import SF_SMALL
from .oracle_utils import duckdb_conn

# WITH-chain shared by the three DuckDB probes: chunk table → dedup →
# shingle tf (mirrors the chunk_hybrid_rrf_topk oracle over chunks2)
_PREFIX = f"""
WITH {_SQL_CHUNKS},
dupes AS (
  SELECT doc_id, chunk_id FROM (
    SELECT doc_id, chunk_id,
           ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                              ORDER BY doc_id, chunk_id) AS occ
    FROM chunks
    WHERE doc_id >= {N_QUERY_DOCS} AND n_tokens = {CHUNK_TOKENS}
  ) WHERE occ > 1
),
chunks2 AS (
  SELECT c.* FROM chunks c
  ANTI JOIN dupes d
    ON d.doc_id = c.doc_id AND d.chunk_id = c.chunk_id
),
ctoks AS (
  SELECT doc_id, chunk_id,
         {_SQL_TOKS.replace('text', 'chunk_text')} AS t
  FROM chunks2
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
)"""

_SQL_FUSED = f"""{_PREFIX},
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
  ) WHERE rnk <= {_RAG_FUSED}
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
  ) WHERE rnk <= {_RAG_FUSED}
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
) WHERE rrf_rank <= {_RAG_FUSED}
ORDER BY q_doc, q_chunk, rrf_rank
"""

_SQL_VECS = f"""{_PREFIX}
SELECT doc_id, chunk_id,
       CAST({_SQL_HASH60} % {HASH_DIM} AS INTEGER) AS b,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM tf GROUP BY 1, 2, 3
"""

_PREFIX_CHUNKS2 = _PREFIX.split(",\nctoks")[0]
_SQL_NTOK = f"""{_PREFIX_CHUNKS2}
SELECT doc_id, chunk_id, n_tokens FROM chunks2
"""


def _replay(con) -> pd.DataFrame:
    fused = con.execute(_SQL_FUSED).fetchdf()
    vecs = con.execute(_SQL_VECS).fetchdf()
    ntok = con.execute(_SQL_NTOK).fetchdf()
    vmap: dict[tuple[int, int], np.ndarray] = {}
    for (dc, ck), g in vecs.groupby(["doc_id", "chunk_id"]):
        v = np.zeros(HASH_DIM)
        v[g["b"].to_numpy()] = g["cnt"].to_numpy(dtype=np.float64)
        vmap[(int(dc), int(ck))] = v
    tmap = {
        (int(r.doc_id), int(r.chunk_id)): int(r.n_tokens)
        for r in ntok.itertuples()
    }
    out = []
    for q_doc, dgrp in fused.groupby("q_doc", sort=True):
        selected = []
        for q_chunk, grp in dgrp.groupby("q_chunk", sort=True):
            grp = grp.sort_values("rrf_rank").reset_index(drop=True)
            V = np.array(
                [
                    vmap.get(
                        (int(r.c_doc), int(r.c_chunk)), np.zeros(HASH_DIM)
                    )
                    for r in grp.itertuples()
                ]
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
                cd, cc = int(grp["c_doc"].iloc[i]), int(grp["c_chunk"].iloc[i])
                selected.append(
                    (
                        int(q_chunk),
                        step,
                        cd,
                        cc,
                        tmap[(cd, cc)],
                        float(grp["rrf_score"].iloc[i]),
                        round(float(score[i]), 6),
                    )
                )
                picked[i] = True
                max_sim = np.maximum(max_sim, S[:, i])
        seen = set()
        ctx, pos, cum = 0, 0, 0
        for q_chunk, step, c_doc, c_chunk, nt, rrf, mmr in selected:
            if (c_doc, c_chunk) in seen:
                continue
            seen.add((c_doc, c_chunk))
            if pos > 0 and cum + nt > _RAG_CTX_TOKENS:
                ctx, pos, cum = ctx + 1, 0, 0
            pos += 1
            cum += nt
            out.append(
                (int(q_doc), ctx, pos, q_chunk, step, c_doc, c_chunk, nt,
                 cum, rrf, mmr)
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


def test_rag_e2e_matches_duckdb_numpy(spark):
    got = rag_pipeline_end2end(spark, SF_SMALL).toPandas()
    con = duckdb_conn(SF_SMALL)
    want = _replay(con)
    assert len(got) == len(want) > 0
    g = got.sort_values(["q_doc", "ctx_window", "position"]).reset_index(
        drop=True
    )
    w = want.sort_values(["q_doc", "ctx_window", "position"]).reset_index(
        drop=True
    )
    for col in ("q_doc", "ctx_window", "position", "q_chunk", "mmr_rank",
                "c_doc", "c_chunk", "n_tokens", "cum_tokens"):
        assert g[col].tolist() == w[col].tolist(), col
    assert np.allclose(g["rrf_score"], w["rrf_score"], atol=1e-12)
    assert np.allclose(g["mmr_score"], w["mmr_score"], atol=1e-9)
    # structural invariants: budget respected, positions contiguous,
    # no repeated corpus chunk within a query doc
    for q_doc, grp in g.groupby("q_doc"):
        assert grp["cum_tokens"].max() <= _RAG_CTX_TOKENS
        assert not grp.duplicated(["c_doc", "c_chunk"]).any()
        for _, wgrp in grp.groupby("ctx_window"):
            assert wgrp["position"].tolist() == list(
                range(1, len(wgrp) + 1)
            )
