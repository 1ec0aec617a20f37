"""Skew-handling primitives (SURVEY.md §7.5 watch-list; the 100 TB
mandate's "salting for skew").

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two places it can't:

- :func:`salted_aggregate` — two-phase aggregation when ONE group key
  dominates (AQE splits partitions, not groups; a single hot key still
  lands every row in one reducer).  Phase 1 aggregates (key, salt)
  sub-groups map-side-wide; phase 2 merges the bounded sub-results.
- :func:`salted_join` — replicate the small side per salt so a skewed
  probe key spreads over ``n_salts`` reducers, for shuffle joins where
  neither side broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {"sum", "count", "min", "max"} (the algebraic aggregates that
    re-merge with the same function — avg is sum/count downstream).

    Deterministic salt from a hash of a stable row attribute would be
    reproducible but any distribution works — correctness never depends
    on salt placement, only the final merge."""
    supported = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"unsupported agg {fn!r}")

    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[supported[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed shuffle join: salt the (skewed) fact side randomly-by-
    partition, replicate the dim side across all salts, join on
    (key, salt).  Output equals the plain join; hot keys fan out over
    ``n_salts`` reducers instead of one.

    Only ``inner`` and ``left`` (outer on the fact side) are supported:
    the dim side is replicated once per salt, so any join type that
    emits *unmatched dim rows* ('right'/'full'/'left_semi' from dim's
    perspective) would emit them ``n_salts`` times."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} — "
            "dim rows are replicated per salt, so dim-preserving join "
            "types would duplicate unmatched dim rows"
        )
    f = fact.withColumn("_salt", (F.spark_partition_id() % n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    d = dim.select("*", salts)
    out = f.join(d, on=[on, "_salt"], how=how)
    return out.drop("_salt")
