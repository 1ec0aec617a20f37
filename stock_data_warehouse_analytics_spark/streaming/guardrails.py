"""Streaming experiment guardrails: windowed SRM monitoring.

The batch face is registered as ``stream_srm_monitor``
(``plans/ab_testing2.py``); this module holds the shared plan builder
so the true ``readStream`` path and the oracle-checked batch twin are
the SAME expressions (the stream≡batch stance of
``streaming/admission.py``).

Variant assignment is a pure map-side expression (md5 int60 of the
user key, mod 2) — no state store, no join; the windowed count is the
only stateful operator, and the watermark bounds its state.  This is
the real-time sample-ratio-mismatch alarm every experimentation
platform runs next to the batch readout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash_int60


def srm_windowed(
    events: DataFrame, minutes: int = 60, *, ordered: bool = True
) -> DataFrame:
    """Per-tumbling-window variant counts + chi-square SRM flag.

    Works identically under batch and readStream (``ordered=False`` —
    streaming append mode cannot sort)."""
    variant = hash_int60(F.col("user_id").cast("string")) % 2
    g = (
        events.withColumn("variant", variant)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"))
        .agg(
            F.count(F.when(F.col("variant") == 0, 1)).alias("n_c"),
            F.count(F.when(F.col("variant") == 1, 1)).alias("n_t"),
        )
    )
    expd = (F.col("n_c") + F.col("n_t")).cast("double") / 2
    chi2 = F.round(
        (
            (F.col("n_c") - expd) * (F.col("n_c") - expd)
            + (F.col("n_t") - expd) * (F.col("n_t") - expd)
        )
        / expd,
        6,
    )
    out = g.select(
        F.col("w.start").alias("window_start"),
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        chi2.alias("chi2"),
        (chi2 > F.lit(3.841459)).alias("srm_flag"),
    )
    return out.orderBy("window_start") if ordered else out


def run_srm_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "srm_stream_out",
    minutes: int = 60,
    watermark: str = "30 minutes",
):
    """True readStream SRM monitor over a JSON event dump — watermark +
    tumbling windowed counts, append mode (alerts emit on window
    close)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
    )
    out = srm_windowed(stream, minutes=minutes, ordered=False)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------- streaming conformal gate

_CONF_GATE_NUM = 9  # one-sided conformal level 9/10 (admit ~90%)
_EPOCH = "1970-01-01"


def conformal_qhat(events: DataFrame) -> DataFrame:
    """BATCH-FIT per-type conformal threshold: q̂ is the
    ⌈(1−α)(n+1)⌉-th smallest per-event cents score among CALIBRATION
    events (even epoch-day parity — the deterministic split of
    ``eval_conformal_coverage``, applied at event grain), computed with
    the exact integer rank (9(n+1)+9)//10.  This is the static side a
    production gate refits on a batch cadence and broadcasts into the
    stream.

    Small-n convention: when the rank exceeds n_cal (n_cal < 18 at the
    9/10 level — too few calibration points for a finite 90% bound),
    the conformal quantile is +∞; the row is emitted with
    ``q_hat_cents`` NULL as the admit-all sentinel, so under-calibrated
    types are ADMITTED by :func:`conformal_gate` rather than silently
    dropped by a missing join key (the round-6 review's coverage
    gap)."""
    from pyspark.sql.window import Window

    cents = F.round(F.col("value") * 100, 0).cast("long")
    parity = (
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit(_EPOCH))) % 2
    )
    cal = events.filter(parity == 0).select(
        "event_type", cents.alias("score"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("score", "event_id")
    rk = cal.withColumn("rk", F.row_number().over(w))
    n = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cal"))
    sel = (
        rk.join(F.broadcast(n), "event_type")
        .filter(
            F.col("rk")
            == F.expr(
                f"({_CONF_GATE_NUM} * (n_cal + 1) + {_CONF_GATE_NUM}) div 10"
            )
        )
        .select("event_type", F.col("score").alias("q_hat_cents"))
    )
    return n.join(sel, "event_type", "left").select(
        "event_type", "n_cal", "q_hat_cents"
    )


def conformal_gate(events: DataFrame, qhat: DataFrame) -> DataFrame:
    """STATELESS conformal admission gate — the streaming twin of
    ``eval_conformal_coverage``'s interval check: broadcast the
    batch-fit q̂ table into a stream-static equi-join and flag each
    EVALUATION event (odd epoch-day parity) by whether its score is
    within the conformal bound.  No state store, no watermark needed:
    a per-row expression + broadcast join is streaming-legal in append
    mode at any rate, which is the point of fitting q̂ in batch.

    A NULL ``q_hat_cents`` (the +∞ admit-all sentinel for
    under-calibrated types, see :func:`conformal_qhat`) and a type
    absent from the q̂ table entirely (zero calibration events — the
    join is LEFT for this reason) both admit: no finite bound exists,
    and a guardrail that silently drops traffic is worse than one that
    abstains."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    parity = (
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit(_EPOCH))) % 2
    )
    return (
        events.filter(parity == 1)
        .select("event_id", "event_type", cents.alias("score_cents"))
        .join(F.broadcast(qhat), "event_type", "left")
        .withColumn(
            "admitted",
            F.col("q_hat_cents").isNull()
            | (F.col("score_cents") <= F.col("q_hat_cents")),
        )
    )


def run_conformal_gate_stream(
    spark: SparkSession,
    source_dir: str,
    qhat: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "conformal_gate_out",
):
    """True readStream conformal gate over a JSON event dump: the
    stateless ``conformal_gate`` plan under append mode with an
    availableNow trigger — every evaluation event emits exactly one
    flagged row (stream ≡ batch pinned by
    tests/test_streaming_multimodal.py::test_stream_conformal_gate_equals_batch)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).json(source_dir)
    out = conformal_gate(stream, qhat)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------- streaming DP histogram cells


def daily_type_counts(events: DataFrame, *, ordered: bool = True) -> DataFrame:
    """(d, event_type, n) at day grain via the event-time tumbling
    window — the streaming-legal form of the
    ``dq_dp_daily_histogram`` base census (watermark bounds state at
    open-days × |types| rows).  The DP release itself (grid fill +
    noise) runs at READ time over these stored cells — noise must
    never be added incrementally, because re-noising a cell on every
    update would destroy the Laplace calibration; maintain true
    counts, noise once at publication (the store-then-release split
    every DP warehouse uses)."""
    g = (
        events.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("w.start").cast("date").alias("d"), "event_type", "n"
        )
    )
    return g.orderBy("d", "event_type") if ordered else g


def run_dp_histogram_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "dp_hist_stream_out",
    watermark: str = "2 hours",
):
    """True readStream maintenance of the DP histogram's base cells
    over a JSON event dump — watermark + tumbling-day counts, append
    mode (cells emit on window close); stream ≡ batch pinned by
    tests/test_streaming_multimodal.py::test_stream_dp_histogram_cells_equal_batch."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
    )
    out = daily_type_counts(stream, ordered=False)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
