"""Iterative linear algebra over embeddings — dominant principal
component by power iteration, cross-engine exact.

Why this shape: PCA/top-eigenvector is the standard embedding-space
diagnostic (dominant-direction removal, whitening, drift detection).
The scalable formulation is the two-phase one used here:

1. **One pass over the vectors** builds the d×d Gram matrix of
   centered values — an outer-product aggregation whose shuffle volume
   is d² (4096 rows), never ∝ corpus size.  This is the only part that
   touches corpus-sized data, and it is fully distributed.
2. **Power iteration runs on the collected d×d matrix driver-side** —
   the state is DIMENSION-sized (bounded), so the driver loop is the
   right scale call (same stance as fitting the IVF quantizer: only
   k×d centroids ever reach the driver).  Contrast with
   ``graph_pagerank_nations`` / ``dedup_clusters_cc``, whose iteration
   state is DATA-sized and therefore stays relational with
   per-round ``localCheckpoint``.

Cross-engine exactness: every AGGREGATION is exact int64 (values
quantized to micro-units via ``floor(v·1e6)`` — see
emb_centroids_by_label), and every scalar rescale is an identical
sequence of IEEE-double ops (deterministic given identical inputs), so
Spark and the unrolled-CTE DuckDB oracle agree bit-for-bit.  The
``// 1e9`` down-scale of Gram entries before iterating keeps
per-term products inside int64; the precision it discards is applied
identically by both engines (fixed-point trade: ~6 significant digits
retained, far beyond what a direction estimate needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..operators.localrel import literal_df
from .registry import register

# 40 rounds: the testdata covariance has a nearly-degenerate top pair
# (λ1/λ2 ≈ 1.07 at sf0.001), so convergence to the true eigenvector is
# slow — (λ2/λ1)^40 ≈ 0.06.  The distributed loop's CONTRACT (asserted
# in tests/test_iterative_ops.py) is exact agreement with the
# mathematical power iterate at the same k; proximity to the true PC1
# is spectrum-dependent.
PI_ITERS = 40
_Q = 1_000_000.0  # micro-unit quantization
_GRAM_DOWNSCALE = 1.0e9


def _pc1_oracle() -> str:
    # Every CTE is MATERIALIZED: y{i} is referenced twice (max-norm and
    # rescale), so plain inlining doubles the expression tree per
    # iteration — 2^40 scans ("Too many open files") without the hint.
    parts = [
        f"""
WITH flat AS MATERIALIZED (
  SELECT vec_id,
         unnest(generate_series(0, len(embedding) - 1))::INT AS dim,
         CAST(FLOOR(unnest(embedding)::DOUBLE * {_Q}) AS BIGINT) AS q
  FROM embeddings
),
means AS MATERIALIZED (
  SELECT dim,
         CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM flat GROUP BY dim
),
centered AS MATERIALIZED (
  SELECT f.vec_id, f.dim, f.q - m.m AS c
  FROM flat f JOIN means m ON f.dim = m.dim
),
gram AS MATERIALIZED (
  SELECT a.dim AS j, b.dim AS k,
         CAST(FLOOR(CAST(SUM(a.c * b.c) AS DOUBLE) / {_GRAM_DOWNSCALE})
              AS BIGINT) AS g
  FROM centered a JOIN centered b ON a.vec_id = b.vec_id
  GROUP BY j, k
),
dims AS MATERIALIZED (SELECT DISTINCT dim FROM flat),
x0 AS MATERIALIZED (SELECT dim, {int(_Q)}::BIGINT AS x FROM dims)"""
    ]
    for i in range(1, PI_ITERS + 1):
        parts.append(
            f""",
y{i} AS MATERIALIZED (
  SELECT g.j AS dim, SUM(g.g * x.x)::BIGINT AS y
  FROM gram g JOIN x{i - 1} x ON g.k = x.dim
  GROUP BY g.j
),
m{i} AS MATERIALIZED (SELECT MAX(ABS(y))::BIGINT AS m FROM y{i}),
x{i} AS MATERIALIZED (
  SELECT y.dim,
         CAST(FLOOR(CAST(y.y AS DOUBLE) / CAST(m.m AS DOUBLE) * {_Q})
              AS BIGINT) AS x
  FROM y{i} y CROSS JOIN m{i} m
)"""
        )
    parts.append(
        f"""
SELECT dim, x AS pc1_micro FROM x{PI_ITERS} ORDER BY dim
"""
    )
    return "".join(parts)


@register(
    "emb_power_iteration_pc1",
    tags=("embedding", "iterative", "pca", "linalg"),
    oracle=_pc1_oracle(),
)
def emb_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus (centered,
    un-normalized PCA) by ``PI_ITERS``-round power iteration in fixed-point —
    see module docstring for the exactness/scale story.  Output is the
    direction scaled to max-|component| = 1e6 (sign follows the
    all-ones start vector deterministically)."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("v").cast("double") * _Q).cast("long").alias("q"),
    )
    means = flat.groupBy(F.col("dim").alias("m_dim")).agg(
        F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("m")
    )
    centered = (
        flat.join(F.broadcast(means), flat.dim == F.col("m_dim"))
        .select("vec_id", "dim", (F.col("q") - F.col("m")).alias("c"))
    )
    a = centered.select("vec_id", F.col("dim").alias("j"), F.col("c").alias("cj"))
    b = centered.select(
        F.col("vec_id").alias("b_vec"), F.col("dim").alias("k"), F.col("c").alias("ck")
    )
    gram = (
        a.join(b, F.col("vec_id") == F.col("b_vec"))
        .groupBy("j", "k")
        .agg(
            F.floor(
                F.sum(F.col("cj") * F.col("ck")).cast("double") / _GRAM_DOWNSCALE
            )
            .cast("long")
            .alias("g")
        )
    )
    # d² = 4096 rows — bounded by dimension, NOT by corpus size: the
    # one collect a 100 TB run would also do.  The iteration replicates
    # the oracle's arithmetic exactly: Python ints are the same values
    # int64 holds (no overflow by the downscale bound), float() is the
    # same IEEE-754 nearest-even conversion both engines apply, and
    # math.floor the same floor.
    import math

    rows = gram.collect()
    g: dict[int, list[tuple[int, int]]] = {}
    dims: set[int] = set()
    for r in rows:
        g.setdefault(r.k, []).append((r.j, r.g))
        dims.add(r.j)
    x = {d: int(_Q) for d in sorted(dims)}
    for _ in range(PI_ITERS):
        y = dict.fromkeys(x, 0)
        for k, outs in g.items():
            xk = x[k]
            for j, gv in outs:
                y[j] += gv * xk
        m = max(abs(v) for v in y.values())
        x = {
            d: math.floor(float(y[d]) / float(m) * _Q) for d in sorted(y)
        }
    out = [(int(d), int(v)) for d, v in sorted(x.items())]
    return literal_df(spark, out, "dim int, pc1_micro long").orderBy("dim")
