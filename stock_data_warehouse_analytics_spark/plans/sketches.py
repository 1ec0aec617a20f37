"""Mergeable-sketch aggregation (HyperLogLog): the algebra that makes
100 TB rollups maintainable — per-partition sketches are persisted once
and any coarser grouping is a SKETCH UNION, never a re-scan of raw data
(same re-aggregation contract as ``streaming/incremental.py``'s
algebraic rollup, extended to distinct counts, which are NOT algebraic
on raw values).

No DuckDB oracle: sketch estimates are implementation-defined (DuckDB's
own HLL differs), so the query is rows-only for the driver; accuracy
against the exact distinct count is pinned in
``tests/test_dedup_recall.py`` (≤ 5% relative at this cardinality —
Spark's HLL default rsd is 2.3%... lgConfigK=12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


@register(
    "agg_hll_sketch_union",
    tags=("agg", "sketch", "hll", "mergeable"),
    oracle=None,  # estimates are engine-specific; accuracy pinned in pytest
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user HLL sketches, then the global
    distinct-user count obtained by UNIONING the sketches — no second
    pass over raw events.  Emits per-type and 'ALL' rows with the
    sketch estimate next to the exact distinct count and the relative
    error, so the trade is visible in the result itself."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    per_type = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("estimate"),
        "exact_distinct",
    )
    # the union path touches only |event_types| sketch blobs
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("estimate")
    )
    exact_all = e.agg(F.count_distinct("user_id").alias("exact_distinct"))
    all_row = merged.crossJoin(exact_all).select(
        F.lit("ALL").alias("event_type"), "estimate", "exact_distinct"
    )
    rel_err = F.round(
        F.abs(F.col("estimate") - F.col("exact_distinct"))
        / F.col("exact_distinct"),
        4,
    )
    return (
        per_type.unionByName(all_row)
        .withColumn("rel_err", rel_err)
        .orderBy("event_type")
    )


_CMS_DEPTH = 4
_CMS_WIDTH = 256
_SQL_H60_CMS = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


@register(
    "sketch_count_min_heavy_hitters",
    tags=("agg", "sketch", "count-min", "mergeable"),
    oracle=f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS k FROM events
),
cells AS (
  SELECT d.depth,
         {_SQL_H60_CMS.format(x="d.depth || ':' || k")} % {_CMS_WIDTH} AS bucket,
         COUNT(*)::BIGINT AS cnt
  FROM keyed, (SELECT unnest([0, 1, 2, 3]) AS depth) d
  GROUP BY 1, 2
),
exact AS (
  SELECT k, COUNT(*)::BIGINT AS exact_cnt
  FROM keyed GROUP BY k
  ORDER BY exact_cnt DESC, k
  LIMIT 10
),
est AS (
  SELECT e.k, e.exact_cnt, MIN(c.cnt)::BIGINT AS cms_est
  FROM exact e, (SELECT unnest([0, 1, 2, 3]) AS depth) d
  JOIN cells c
    ON c.depth = d.depth
   AND c.bucket = {_SQL_H60_CMS.format(x="d.depth || ':' || e.k")} % {_CMS_WIDTH}
  GROUP BY e.k, e.exact_cnt
)
SELECT k AS user_key, exact_cnt, cms_est,
       (cms_est - exact_cnt)::BIGINT AS overestimate
FROM est
ORDER BY exact_cnt DESC, user_key
""",
)
def sketch_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, relationally: the sketch IS a (depth, bucket,
    count) table — 4×256 cells via the shared md5 hash, built with one
    map-side-combined aggregation whose output is bounded by the cell
    count, never by cardinality.  Merging sketches (across partitions,
    days, clusters) is summing cells — the same mergeable-rollup
    algebra as the HLL union above, but for POINT FREQUENCY estimates.
    The query estimates the 10 heaviest users and reports the exact
    count beside the CMS estimate; ``overestimate ≥ 0`` always (CMS
    one-sided error).  Fully deterministic hashing → unlike the opaque
    builtin ``count_min_sketch`` blob, this formulation is
    oracle-exact."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    depths = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    from ..operators.dedup import hash_int60

    def bucket(depth_col, key_col):
        return hash_int60(
            F.concat(depth_col.cast("string"), F.lit(":"), key_col)
        ) % _CMS_WIDTH

    cells = (
        e.select(F.explode(depths).alias("depth"), "k")
        .select("depth", bucket(F.col("depth"), F.col("k")).alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        e.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "k")
        .limit(10)
    )
    probes = exact.select(
        "k", "exact_cnt", F.explode(depths).alias("depth")
    ).select(
        "k", "exact_cnt", "depth", bucket(F.col("depth"), F.col("k")).alias("bucket")
    )
    est = (
        probes.join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        F.col("k").alias("user_key"),
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
    ).orderBy(F.desc("exact_cnt"), "user_key")
