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
