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
