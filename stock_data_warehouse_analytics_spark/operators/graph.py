"""Distributed connected components — the clustering step that turns
near-duplicate PAIRS (minhash/simhash/embedding candidates) into dedup
CLUSTERS, so a pipeline can keep one canonical document per cluster.

Algorithm: min-label propagation accelerated with pointer jumping.
Each round propagates labels over the data edges AND the current
label-pointer edges (node↔component, both directions), so label
information travels two hops per round — convergence in
O(log diameter) rounds rather than O(diameter), the same idea that
makes large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") polylog.  The loop exits the first round that
changes nothing.

Scale notes:
- each round is ONE join + ONE grouped min over (edges + 2·nodes)
  rows — shuffle volume ∝ edges;
- ``localCheckpoint`` after every round cuts the lineage/plan growth
  that otherwise doubles per iteration (on a cluster you'd use a
  checkpoint dir or persist-to-table between rounds);
- the convergence check is a bounded count action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable via undirected
    paths.  Deterministic by construction (min over a set)."""
    # materialize the edge list FIRST, then derive the symmetric
    # closure from the checkpointed copy — a union of two selects over
    # the raw plan would execute the (often expensive) upstream
    # pair-generation twice
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    sym = fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # data edges + label-pointer edges (both directions): min over
        # this augmented neighborhood is one propagation hop AND one
        # pointer jump in the same round
        aug = (
            sym.unionByName(labels.select(F.col("node").alias("a"), F.col("comp").alias("b")))
            .unionByName(labels.select(F.col("comp").alias("a"), F.col("node").alias("b")))
        )
        nbr_min = (
            aug.join(labels, aug["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        merged = labels.join(
            nbr_min, labels["node"] == nbr_min["a"], "left"
        ).select(
            "node",
            F.col("comp").alias("old_comp"),
            F.least(
                F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
            ).alias("comp"),
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.filter(F.col("comp") != F.col("old_comp")).count()
        labels = merged.select("node", "comp")
        if changed == 0:
            break
    return labels
