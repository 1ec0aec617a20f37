"""Event-time windowing (SURVEY.md §2.10 / §7.6): tumbling, sliding and
session windows over the ``events`` table, plus a true Structured
Streaming pipeline.

The reference has no streaming at all; this is the mandated extension
surface.  Each operator is written **batch-equivalently** — the exact
same ``F.window`` / ``session_window`` expressions run under
``readStream`` (see :func:`streaming_session`) — so the DuckDB oracle
can verify the windowed-aggregation semantics, and the streaming test
checks stream-vs-batch result equality.

Scale notes: windowed aggs shuffle once on (window, key); watermarks
bound state for unbounded input; session windows merge in the state
store under streaming and via gaps-and-islands under batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "streaming_session",
    "run_stream_batch_equiv",
    "click_purchase_interval_join",
    "run_stream_stream_join",
]


def tumbling_agg(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per
    (window_start, event_type)."""
    from ..plans.exact import dsum

    win = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def sliding_agg(
    events: DataFrame, width_minutes: int = 10, slide_minutes: int = 5
) -> DataFrame:
    """Sliding windows (width > slide ⇒ overlapping assignment)."""
    from ..plans.exact import dsum

    win = F.window("ts", f"{width_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


def session_agg(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Session windows per user (gap-based).  Uses ``session_window``
    so the identical expression streams; the oracle mirrors it with
    gaps-and-islands SQL."""
    from ..plans.exact import dsum

    sw = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy(sw.alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


def sessionize_islands(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Batch sessionization via gaps-and-islands windows (the classic
    relational formulation) — same sessions as :func:`session_agg`,
    exposed for engines/flows without session_window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60)
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > gap),
        1,
    ).otherwise(0)
    df = events.withColumn(
        "_sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        df.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sid")
    )


def streaming_session(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_out",
    minutes: int = 5,
    watermark: str = "30 minutes",
):
    """True Structured Streaming: file source → watermark → tumbling
    window agg → memory sink (append on window close).

    Watermark semantics: events later than ``watermark`` behind the max
    seen event time are dropped; state for closed windows is evicted —
    the property that bounds memory on unbounded input."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def streaming_session_windows(
    spark: SparkSession,
    source_dir: str,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_sessions",
    gap_minutes: int = 10,
    watermark: str = "30 minutes",
    use_rocksdb: bool = True,
):
    """True Structured Streaming session windows: file source →
    watermark → ``session_window`` agg → memory sink, with the RocksDB
    state store provider — the production state backend for large
    session state (spillable, incremental-checkpointing; the default
    HDFS-backed provider keeps all state on-heap, which is the first
    thing to fall over when millions of sessions are open).  The
    provider is a per-query conf picked up at stream start; restored
    by the caller (tests) after the run.

    Append mode: a session emits only when the watermark passes its
    end (last event + gap) — the batch twin of that final output is
    :func:`session_final_output`."""
    if use_rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    from ..plans.exact import dsum

    sw = F.session_window("ts", f"{gap_minutes} minutes")
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(sw.alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    return (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_final_output(
    events: DataFrame, *, gap_minutes: int = 10, watermark_hours: float = 0.5
) -> DataFrame:
    """Batch mirror of the streaming session-window run's FINAL output
    (append mode): sessions whose end (last event + gap) the final
    watermark — ``max(all ts) − watermark`` — has passed.  Sessions
    still open at termination stay in state and never emit."""
    from ..plans.exact import dsum

    wm_secs = int(round(watermark_hours * 3600))
    sw = F.session_window("ts", f"{gap_minutes} minutes")
    sessions = (
        events.groupBy(sw.alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    cutoff = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {wm_secs} SECONDS")).alias("final_wm")
    )
    return (
        sessions.crossJoin(F.broadcast(cutoff))
        .where(F.col("session_end") < F.col("final_wm"))
        .drop("final_wm")
    )


def click_purchase_interval_join(
    events: DataFrame, *, within_minutes: int = 30, how: str = "inner"
) -> DataFrame:
    """Interval (time-bound) join: each click matched to the same
    user's purchases in ``[click_ts, click_ts + within_minutes]``.
    Written so the IDENTICAL join runs as a stream-stream join under
    ``readStream`` (see :func:`run_stream_stream_join`): equi-key on
    user_id plus a two-sided time bound — exactly the condition shape
    Structured Streaming needs to size its join state."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        # distinct alias: both sides derive from the SAME events frame,
        # so an unrenamed user_id is ambiguous after the self-join
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (clicks.user_id == purchases.p_user)
        & (purchases.purchase_ts >= clicks.click_ts)
        & (
            purchases.purchase_ts
            <= clicks.click_ts + F.expr(f"INTERVAL {within_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond, how).select(
        # coalesce covers the full-outer case (either side may be null);
        # for inner/left it is exactly clicks.user_id
        F.coalesce(F.col("user_id"), F.col("p_user")).alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def _watermark_hours(watermark: str) -> float:
    """Parse a Spark watermark duration string ('2 hours', '30 minutes',
    '90 seconds') to hours.  Raises on unsupported/ambiguous units
    instead of silently defaulting (the silent 2-hour fallback made the
    stream/batch equivalence comparison wrong for non-hour watermarks)."""
    parts = watermark.strip().split()
    if len(parts) != 2:
        raise ValueError(f"unsupported watermark format: {watermark!r}")
    per_hour = {"hour": 1.0, "minute": 60.0, "second": 3600.0}
    unit = parts[1].lower().rstrip("s")
    if unit not in per_hour:
        raise ValueError(f"unsupported watermark unit: {watermark!r}")
    return float(parts[0]) / per_hour[unit]


def left_outer_final_output(
    events: DataFrame,
    *,
    within_minutes: int = 30,
    watermark_hours: float = 2,
) -> DataFrame:
    """Batch mirror of the stream-stream LEFT OUTER interval join's
    FINAL output.

    A streaming left-outer join emits matches immediately but can only
    emit a null-padded row once the watermark proves no future purchase
    can match — i.e. when ``click_ts + within < final_watermark`` where
    ``final_watermark = max(event ts) - watermark``.  Unmatched clicks
    younger than that cutoff are still held in state when a bounded run
    terminates, so they never appear.  This batch plan reproduces
    exactly that: plain left join, then keep matched rows plus only the
    evicted unmatched ones (asserted equal to the real readStream run
    in tests/test_streaming_multimodal.py)."""
    joined = click_purchase_interval_join(
        events, within_minutes=within_minutes, how="left"
    )
    wm_secs = int(round(watermark_hours * 3600))
    cutoff = events.agg(
        (
            F.max("ts")
            - F.expr(f"INTERVAL {wm_secs} SECONDS")
            - F.expr(f"INTERVAL {within_minutes} MINUTES")
        ).alias("evict_before")
    )
    return joined.crossJoin(F.broadcast(cutoff)).where(
        F.col("purchase_id").isNotNull()
        | (F.col("click_ts") < F.col("evict_before"))
    ).drop("evict_before")


def full_outer_final_output(
    events: DataFrame,
    *,
    within_minutes: int = 30,
    watermark_hours: float = 2,
) -> DataFrame:
    """Batch mirror of the stream-stream FULL OUTER interval join's
    final output.  Null-padded rows emit on state eviction, and the two
    sides evict at DIFFERENT thresholds: a click's join window closes
    at ``click_ts + within`` (so it evicts when the watermark passes
    that), while a purchase can only ever match clicks with
    ``click_ts ≤ purchase_ts`` — its window closes at ``purchase_ts``
    itself, so it evicts as soon as the watermark passes its own
    timestamp.  Asserted equal to the real readStream run in tests."""
    joined = click_purchase_interval_join(
        events, within_minutes=within_minutes, how="full"
    )
    wm_secs = int(round(watermark_hours * 3600))
    cutoff = events.agg(
        (
            F.max("ts")
            - F.expr(f"INTERVAL {wm_secs} SECONDS")
            - F.expr(f"INTERVAL {within_minutes} MINUTES")
        ).alias("click_evict_before"),
        (F.max("ts") - F.expr(f"INTERVAL {wm_secs} SECONDS")).alias(
            "purchase_evict_before"
        ),
    )
    return (
        joined.crossJoin(F.broadcast(cutoff))
        .where(
            (F.col("purchase_id").isNotNull() & F.col("click_id").isNotNull())
            | (
                F.col("purchase_id").isNull()
                & (F.col("click_ts") < F.col("click_evict_before"))
            )
            | (
                F.col("click_id").isNull()
                & (F.col("purchase_ts") < F.col("purchase_evict_before"))
            )
        )
        .drop("click_evict_before", "purchase_evict_before")
    )


def run_stream_stream_join(
    spark: SparkSession,
    events: DataFrame,
    tmp_dir: str,
    *,
    within_minutes: int = 30,
    watermark: str = "2 hours",
    how: str = "inner",
) -> tuple[DataFrame, DataFrame]:
    """Stream-stream join equivalence harness: dump ``events`` to a file
    source, run the clicks⋈purchases interval join with both sides
    watermarked (an inner time-bound join emits matches immediately;
    the watermark + bound let the engine evict join state — the
    property that makes it runnable on unbounded streams), and return
    (stream_result, batch_result).

    ``how="left"`` runs the LEFT OUTER variant: null-padded rows for
    unmatched clicks are emitted only on state eviction, so the batch
    mirror is :func:`left_outer_final_output` (watermark-aware), not
    the plain left join.

    Streaming self-joins of one source are supported by Spark; the two
    sides here are two filtered reads of the same file stream."""
    import os

    src = os.path.join(tmp_dir, f"ssj_src_{how}")
    ckpt = os.path.join(tmp_dir, f"ssj_ckpt_{how}")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema).json(src).withWatermark("ts", watermark)
    )
    joined = click_purchase_interval_join(
        stream, within_minutes=within_minutes, how=how
    )
    out_table = f"ssj_out_{how}"
    q = (
        joined.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_result = spark.table(out_table)
    wm_hours = _watermark_hours(watermark)
    if how == "left":
        batch_result = left_outer_final_output(
            events, within_minutes=within_minutes, watermark_hours=wm_hours
        )
    elif how == "full":
        batch_result = full_outer_final_output(
            events, within_minutes=within_minutes, watermark_hours=wm_hours
        )
    else:
        batch_result = click_purchase_interval_join(
            events, within_minutes=within_minutes
        )
    return stream_result, batch_result


def run_stream_batch_equiv(
    spark: SparkSession, events: DataFrame, tmp_dir: str, minutes: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Drive the streaming pipeline over a file dump of ``events`` and
    return (stream_result, batch_result) for equivalence checking.
    ``append`` mode emits only watermark-closed windows, so the batch
    side drops the final open window(s) the same way the test does."""
    import os

    src = os.path.join(tmp_dir, "src")
    ckpt = os.path.join(tmp_dir, "ckpt")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = streaming_session(
        spark, src, checkpoint_dir=ckpt, out_table="stream_out", minutes=minutes
    )
    q.awaitTermination()
    stream_result = spark.table("stream_out")
    batch_result = (
        events.groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
    )
    return stream_result, batch_result


def static_enriched_agg(
    events: DataFrame,
    customer: DataFrame,
    hours: int = 6,
    *,
    ordered: bool = True,
) -> DataFrame:
    """Enrich-then-aggregate: join the (possibly streaming) events frame
    to the static customer dimension on user_id = c_custkey (the static
    side of a stream-static join holds no state), then a tumbling
    event-time window per market segment.  The identical expression
    runs under readStream (see streaming_static_enrich) with
    ``ordered=False`` — append-mode streams cannot sort.

    The dimension join is deliberately UNHINTED: customer grows with
    scale factor, so the planner must pick broadcast vs shuffle from
    the static side's actual size (it broadcasts under the
    autoBroadcastJoinThreshold at any realistic dim size) rather than
    a hint that would force-ship a 100 TB-scale dimension to every
    executor per micro-batch."""
    from ..plans.exact import dsum

    dim = customer.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    win = F.window("ts", f"{hours} hours")
    out = (
        events.join(dim, events["user_id"] == dim["c_custkey"])
        .groupBy(win.alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "segment", "n", "total_value"
        )
    )
    return out.orderBy("window_start", "segment") if ordered else out


def streaming_static_enrich(
    spark: SparkSession,
    source_dir: str,
    customer: DataFrame,
    *,
    checkpoint_dir: str,
    out_table: str = "stream_enriched",
    hours: int = 6,
    watermark: str = "30 minutes",
):
    """True readStream version of :func:`static_enriched_agg`: file
    source → watermark → broadcast static-dim join → tumbling window
    agg → memory sink (append)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .json(source_dir)
        .withWatermark("ts", watermark)
    )
    out = static_enriched_agg(stream, customer, hours=hours, ordered=False)
    return (
        out.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
