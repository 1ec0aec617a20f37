"""Streaming mergeable sketches: daily HyperLogLog register
maintenance.

The batch face is registered as ``stream_hll_distinct_daily``
(``plans/sketches2.py``); this module holds the shared register
builder so the true ``readStream`` path and the oracle-checked batch
twin are the SAME expressions (the stream≡batch stance of
``streaming/admission.py`` / ``streaming/guardrails.py``).

This is how production streaming distinct-count actually works: the
STREAM maintains only the (window, bucket) → max-rho register table —
a streaming-legal MIN/MAX aggregate whose state is bounded by
windows × m (never by distinct-key cardinality) — and the ESTIMATE is
computed at read time from the stored registers (here: the batch half
of the registered query).  Registers from different streams, days, or
partitions merge by the same MIN — the mergeability that makes the
sketch warehouse-storable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_int60


def hll_register_columns(events: DataFrame, m: int, term_case: str) -> DataFrame:
    """Map-side (bucket, term) assignment shared by batch and stream:
    md5-int60 of the user key → bucket = h mod m, term = 2^(53−rho) of
    the remaining bits (generated integer CASE, see
    ``plans/sketches2._hll_term_case``)."""
    h = hash_int60(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    return events.select(
        "ts", h.alias("h")
    ).select(
        "ts",
        (F.col("h") % m).alias("bucket"),
        F.expr(f"h div {m}").alias("w"),
    ).select("ts", "bucket", F.expr(term_case).alias("term"))


def hll_daily_registers(
    events: DataFrame, m: int, term_case: str, *, ordered: bool = True
) -> DataFrame:
    """Per-day HLL register table: (window_start, bucket, term) with
    term = MIN over the day's rows (≡ rho MAX).  Identical under batch
    and readStream (MIN is a streaming-legal aggregate; state ≤ open
    windows × m rows under the watermark)."""
    g = (
        hll_register_columns(events, m, term_case)
        .groupBy(F.window("ts", "1 day").alias("wnd"), "bucket")
        .agg(F.min("term").alias("term"))
        .select(
            F.col("wnd.start").alias("window_start"), "bucket", "term"
        )
    )
    return g.orderBy("window_start", "bucket") if ordered else g


def run_hll_stream(
    spark: SparkSession,
    source_dir: str,
    m: int,
    term_case: str,
    *,
    checkpoint_dir: str,
    out_table: str = "hll_stream_out",
    watermark: str = "2 hours",
):
    """True readStream daily-register maintenance over a JSON event
    dump — watermark + tumbling-day MIN registers, append mode
    (registers emit on window close)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
    )
    out = hll_daily_registers(stream, m, term_case, ordered=False)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------ streaming AMS F2 sums

_AMS_K = 16  # must match plans/sketches2._AMS_K


def ams_sign_columns(events: DataFrame, k: int = _AMS_K) -> DataFrame:
    """Map-side (ts, j, sign) fan-out shared by batch and stream: each
    event replicates onto the k estimator axes with its deterministic
    ±1 sign (1 − 2·(h60('ams:'||j||':'||user) mod 2)) — the
    ``sketch_ams_f2`` sign spec applied at EVENT grain, so the daily
    Σ sign equals the frequency-weighted Σ sign·f of the batch
    formulation."""
    from pyspark.sql import functions as FF

    js = FF.explode(
        FF.sequence(FF.lit(0), FF.lit(k - 1))
    ).alias("j")
    fanned = events.select("ts", "user_id", js)
    sign = 1 - 2 * (
        hash_int60(
            FF.concat(
                FF.lit("ams:"),
                FF.col("j").cast("string"),
                FF.lit(":"),
                FF.col("user_id").cast("string"),
            )
        )
        % 2
    )
    return fanned.select("ts", "j", sign.cast("long").alias("s"))


def ams_daily_sums(
    events: DataFrame, *, k: int = _AMS_K, ordered: bool = True
) -> DataFrame:
    """Per-day AMS state: (window_start, j, z) with z = Σ signs over
    the day's events — a streaming-legal SUM whose state is bounded at
    open-windows × k rows at ANY event rate or key cardinality, and
    which merges across days/partitions/streams by addition (the
    mergeability that makes the sketch warehouse-storable).  The F₂
    ESTIMATE (square, group-mean, median) happens at read time over
    the stored sums — never inside the stream."""
    g = (
        ams_sign_columns(events, k)
        .groupBy(F.window("ts", "1 day").alias("wnd"), "j")
        .agg(F.sum("s").cast("long").alias("z"))
        .select(F.col("wnd.start").alias("window_start"), "j", "z")
    )
    return g.orderBy("window_start", "j") if ordered else g


def run_ams_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "ams_stream_out",
    watermark: str = "2 hours",
):
    """True readStream daily AMS-sum maintenance over a JSON event
    dump — watermark + tumbling-day SUMs, append mode; stream ≡ batch
    pinned by tests/test_streaming_multimodal.py::
    test_stream_ams_sums_equal_batch."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
    )
    out = ams_daily_sums(stream, ordered=False)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
