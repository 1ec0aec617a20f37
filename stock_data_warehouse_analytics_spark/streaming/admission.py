"""Streaming dedup ADMISSION — the real-time twin of
``dedup_incremental_new_batch``: documents arrive as a stream, each is
signatured per-row (``operators.dedup.rowwise_minhash_bands`` — a pure
map-side expression, NO aggregation state), and probed against the
static banded index of the existing corpus via a broadcast
stream-static join.

The streaming stage is deliberately STATELESS (map → explode →
broadcast join, append mode): it emits raw (doc_id, corpus_doc_id,
band) match events; the dedup DECISION (any-hit flag, partner count)
is a downstream batch/windowed aggregation — the same
split-signature/decide topology every production admission filter uses,
because it keeps the hot path free of state stores and watermarks.

Stream ≡ batch is asserted in
``tests/test_streaming_multimodal.py::test_stream_dedup_admission_equals_batch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import rowwise_minhash_bands

__all__ = ["admission_matches", "streaming_dedup_admission"]


def admission_matches(new_docs: DataFrame, static_banded: DataFrame) -> DataFrame:
    """(doc_id, corpus_doc_id, band) match events: per-row bands of the
    incoming docs, exploded, probed against the broadcast static index.
    Works identically on a batch OR streaming ``new_docs`` frame —
    every operator here is stateless."""
    newb = new_docs.select(
        "doc_id", F.explode(rowwise_minhash_bands(F.col("text"))).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    return newb.join(
        F.broadcast(static_banded), ["band", "band_hash"]
    ).select("doc_id", "corpus_doc_id", "band")


def streaming_dedup_admission(
    spark: SparkSession,
    source_dir: str,
    static_banded: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_admission",
):
    """True readStream version: json doc stream → per-row signature →
    broadcast probe → memory sink (append, availableNow)."""
    stream = spark.readStream.schema("doc_id long, text string").json(
        source_dir
    )
    out = admission_matches(stream, static_banded)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
