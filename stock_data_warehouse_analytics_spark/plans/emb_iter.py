"""Iterative linear algebra over embeddings — dominant principal
component by power iteration, cross-engine exact.

Why this shape: PCA/top-eigenvector is the standard embedding-space
diagnostic (dominant-direction removal, whitening, drift detection).
The scalable formulation is the two-phase one used here:

1. **One pass over the vectors** builds the d×d Gram matrix of
   centered values — an outer-product aggregation whose shuffle volume
   is d² (4096 rows), never ∝ corpus size.
2. **Power iteration runs on the d×d matrix** — dimension-sized state,
   driver-free, ``localCheckpoint`` per round (iterative-loop rule).

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
from .registry import register

PI_ITERS = 6
_Q = 1_000_000.0  # micro-unit quantization
_GRAM_DOWNSCALE = 1.0e9


def _pc1_oracle() -> str:
    parts = [
        f"""
WITH flat AS (
  SELECT vec_id,
         unnest(generate_series(0, len(embedding) - 1))::INT AS dim,
         CAST(FLOOR(unnest(embedding)::DOUBLE * {_Q}) AS BIGINT) AS q
  FROM embeddings
),
means AS (
  SELECT dim,
         CAST(FLOOR(CAST(SUM(q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM flat GROUP BY dim
),
centered AS (
  SELECT f.vec_id, f.dim, f.q - m.m AS c
  FROM flat f JOIN means m ON f.dim = m.dim
),
gram AS (
  SELECT a.dim AS j, b.dim AS k,
         CAST(FLOOR(CAST(SUM(a.c * b.c) AS DOUBLE) / {_GRAM_DOWNSCALE})
              AS BIGINT) AS g
  FROM centered a JOIN centered b ON a.vec_id = b.vec_id
  GROUP BY j, k
),
dims AS (SELECT DISTINCT dim FROM flat),
x0 AS (SELECT dim, {int(_Q)}::BIGINT AS x FROM dims)"""
    ]
    for i in range(1, PI_ITERS + 1):
        parts.append(
            f""",
y{i} AS (
  SELECT g.j AS dim, SUM(g.g * x.x)::BIGINT AS y
  FROM gram g JOIN x{i - 1} x ON g.k = x.dim
  GROUP BY g.j
),
m{i} AS (SELECT MAX(ABS(y))::BIGINT AS m FROM y{i}),
x{i} AS (
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
    un-normalized PCA) by 6-round power iteration in fixed-point —
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
        .localCheckpoint()  # d² rows; stops vector rescans
    )
    dims = gram.select(F.col("j").alias("dim")).distinct()
    x = dims.select("dim", F.lit(int(_Q)).cast("long").alias("x")).localCheckpoint()
    for _ in range(PI_ITERS):
        y = (
            gram.join(F.broadcast(x), gram.k == x.dim)
            .groupBy(F.col("j").alias("y_dim"))
            .agg(F.sum(F.col("g") * F.col("x")).alias("y"))
        )
        m = y.agg(F.max(F.abs(F.col("y"))).alias("m"))
        x = (
            y.crossJoin(F.broadcast(m))
            .select(
                F.col("y_dim").alias("dim"),
                F.floor(F.col("y").cast("double") / F.col("m").cast("double") * _Q)
                .cast("long")
                .alias("x"),
            )
            .localCheckpoint()
        )
    return x.select("dim", F.col("x").alias("pc1_micro")).orderBy("dim")
