"""Similarity search over embedding columns (``array<float>``) —
brute-force cosine top-k baseline plus an LSH-bucketed ANN scale path
(BASELINE.json north star).

Vector math is pure ``zip_with``/``aggregate`` expressions (JVM-side,
per-row, left-fold deterministic) — no UDFs.  The dot product of two
float vectors accumulates in double (float×float is exact in double),
matching DuckDB's ``list_dot_product`` on cast-to-double lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash_int60

__all__ = [
    "dot",
    "l2_norm",
    "cosine",
    "normalize",
    "topk_bruteforce",
    "hyperplane_signature",
    "topk_lsh",
    "neardup_cosine_pairs",
]


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product in double — deterministic accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Pre-normalized vectors turn cosine into a plain dot product —
    at scale, normalize once at ingest, not per-comparison."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the (small) query set
    against the full corpus, per-row dot product, rank per query.

    Norms are computed ONCE per vector (normalize-at-ingest), so each
    of the O(|Q|·N) comparisons is a single dot product — the corpus is
    read once and never shuffled; only the tiny per-query top-k heaps
    move.  Similarity is rounded to 6 before ranking with an id
    tiebreak, making the result well-defined under FP noise."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), normalize(F.col(vec_col)).alias("_qn")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), normalize(F.col(vec_col)).alias("_cn")
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot(F.col("_qn"), F.col("_cn")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _plane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j derived from
    the 60-bit md5 integer of ``"p{plane}:{j}"`` mapped to [−1, 1].
    No RNG state — any engine can regenerate it exactly."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"p{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        out.append((h / float((1 << 60) - 1)) * 2.0 - 1.0)
    return out


def hyperplane_signature(
    vec: Column, *, dim: int, n_planes: int = 16
) -> Column:
    """Random-hyperplane LSH signature (sign bits of plane·v) packed
    into a long.  Planes are deterministic (md5-derived), so buckets are
    reproducible across runs and engines."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(dim, p)])
        d = dot(plane, vec)
        sig = sig + F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    max_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via hyperplane LSH: candidates are corpus vectors whose
    signature is within ``max_hamming`` sign-bits of the query's, then
    exact cosine re-ranking on the (much smaller) candidate set.

    At scale: signatures are computed once at ingest (a narrow column),
    candidate filtering happens before any vector math, and the corpus
    never shuffles — same shape as the brute-force path with an extra
    cheap integer filter.  Recall is tunable via n_planes/max_hamming."""
    from pyspark.sql import Window

    sig = lambda c: hyperplane_signature(c, dim=dim, n_planes=n_planes)  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"),
        normalize(F.col(vec_col)).alias("_qn"),
        sig(F.col(vec_col)).alias("_qsig"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        normalize(F.col(vec_col)).alias("_cn"),
        sig(F.col(vec_col)).alias("_csig"),
    )
    ham = F.bit_count(F.col("_qsig").bitwiseXOR(F.col("_csig")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .filter(ham <= max_hamming)
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("_qn"), F.col("_cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def neardup_cosine_pairs(
    emb: DataFrame,
    *,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 32,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    ``exact=True``: O(n²) self-join on pre-normalized vectors — the
    oracle-checkable baseline (norms computed n times, not n²).

    Default (scale path): banded hyperplane-LSH — signatures split into
    ``bands`` chunks, candidates only where a whole band matches (a
    bucket equi-join, never an all-pairs comparison), then exact cosine
    on survivors.  By pigeonhole, any pair within ``bands−1`` sign-bit
    flips of each other is guaranteed a shared band; cosine≥threshold
    pairs flip few bits, so recall stays high (measured in tests)."""
    base = emb.select(
        F.col(id_col).alias("id"), normalize(F.col(vec_col)).alias("vn")
    )
    if exact:
        a, b = base.alias("a"), base.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vn").alias("_va"),
            F.col("b.vn").alias("_vb"),
        )
    else:
        width = n_planes // bands
        mask = (1 << width) - 1
        sigged = base.withColumn(
            "sig", hyperplane_signature(F.col("vn"), dim=dim, n_planes=n_planes)
        )
        band_structs = [
            F.struct(
                F.lit(bi).alias("band"),
                F.shiftright(F.col("sig"), bi * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for bi in range(bands)
        ]
        banded = sigged.select(
            "id", "vn", F.explode(F.array(*band_structs)).alias("bb")
        ).select("id", "vn", "bb.band", "bb.band_val")
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(b, on=["band", "band_val"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.vn").alias("_va"),
                F.col("b.vn").alias("_vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(dot(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )
