"""Stateful streaming operator + skew helpers: correctness vs the plain
formulations."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_stateful_running_totals_matches_batch(spark, tmp_path):
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.stateful import (
        running_user_totals,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(2).write.mode("overwrite").json(src)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update per user (multiple micro-batches → multiple rows;
    # the final one carries the complete running total)
    out = spark.sql(
        """
        SELECT user_id, n_events, total_value, max_value FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM stateful_out) WHERE rn = 1
        """
    ).collect()
    got = {r.user_id: (r.n_events, r.total_value, r.max_value) for r in out}

    want = {
        r.user_id: (r.n, r.t, r.m)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("t"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], u
        assert math.isclose(got[u][1], want[u][1], rel_tol=1e-9), u
        assert got[u][2] == want[u][2], u


def test_salted_aggregate_equals_plain(spark):
    from stock_data_warehouse_analytics_spark.operators.skew import salted_aggregate
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    events = load_table(spark, SF_SMALL, "events")
    got = {
        r.event_type: (r.n, round(r.total, 6), r.mx)
        for r in salted_aggregate(
            events,
            ["event_type"],
            {"n": ("value", "count"), "total": ("value", "sum"), "mx": ("value", "max")},
        ).collect()
    }
    want = {
        r.event_type: (r.n, round(r.total, 6), r.mx)
        for r in events.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_equals_plain(spark):
    from stock_data_warehouse_analytics_spark.operators.skew import salted_join
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    cust = cust.withColumnRenamed("c_custkey", "o_custkey")

    got = (
        salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    want = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert {r.c_mktsegment: r["count"] for r in got} == {
        r.c_mktsegment: r["count"] for r in want
    }


def test_encoding_fallback_latin1(spark, tmp_path):
    """S1 — the reference's latin1 retry (preprocess_stocks.py:124-127):
    a CSV with latin1 bytes parses via the fallback encoding."""
    from stock_data_warehouse_analytics_spark.sources.stock_csv import (
        clean_raw,
        read_raw,
    )

    raw = '"Date","Close","Open","High","Low","Volume","Change%"\n'
    raw += '"26/09/2025","36,500.0","37,050.0","37,050.0","36,500.0","903.30K","-2.41%"\n'
    p = tmp_path / "LAT1.csv"
    p.write_bytes(raw.encode("latin1"))

    df = clean_raw(read_raw(spark, str(p), encoding="ISO-8859-1"), ticker="LAT1")
    row = df.collect()[0]
    assert row.Close == 36500.0 and row.Volume == 903300
    assert row.Ticker == "LAT1"
    assert str(row.Date) == "2025-09-26"


def test_tfidf_ml_pipeline(spark):
    """HashingTF+IDF scale path: sparse vectors, deterministic given
    the same input."""
    from stock_data_warehouse_analytics_spark.operators.text_ml import (
        tfidf_features,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = tfidf_features(docs, num_features=1 << 10)
    rows = out.select("doc_id", "tfidf").collect()
    assert len(rows) == docs.count()
    v = rows[0].tfidf
    assert v.size == 1 << 10 and v.numNonzeros() > 0


def test_corrupt_csv_rows_become_nulls_not_crashes(spark, tmp_path):
    """Messy real-world input: truncated rows, garbage numerics, bad
    dates — the ETL must degrade to nulls per-cell (PERMISSIVE +
    try_cast semantics), never fail the job."""
    from stock_data_warehouse_analytics_spark.sources.stock_csv import (
        clean_raw,
        read_raw,
    )

    content = (
        '"Ngày","Lần cuối","Mở","Cao","Thấp","KL","% Thay đổi"\n'
        '"26/09/2025","36,500.0","37,050.0","37,050.0","36,500.0","903.30K","-2.41%"\n'
        '"not-a-date","garbage","##","??","—","12XYZ","pct"\n'
        '"27/09/2025","1,000.0"\n'  # truncated row
        '"","","","","","",""\n'
    )
    p = tmp_path / "MESS.csv"
    p.write_text(content, encoding="utf-8")

    df = clean_raw(read_raw(spark, str(p)), ticker="MESS")
    rows = df.collect()
    assert len(rows) == 4  # every line survives
    good = [r for r in rows if r.Close == 36500.0]
    assert len(good) == 1 and good[0].Volume == 903300
    bad = [r for r in rows if r.Date is None]
    # garbage row: all parsed cells null, no exception
    assert any(r.Close is None and r.Volume is None for r in bad)
    trunc = [r for r in rows if r.Close == 1000.0]
    assert len(trunc) == 1 and trunc[0].Open is None


def test_unknown_extra_column_passes_through(spark, tmp_path):
    """P1 pass-through rule (preprocess_stocks.py:115-116): columns not
    in COL_MAP survive the ETL unchanged, after the fact columns."""
    from stock_data_warehouse_analytics_spark.sources.stock_csv import (
        clean_raw,
        read_raw,
    )

    content = (
        '"Ngày","Lần cuối","Mở","Cao","Thấp","KL","% Thay đổi"," Ghi chú "\n'
        '"26/09/2025","36,500.0","37,050.0","37,050.0","36,500.0","903.30K","-2.41%","note-1"\n'
    )
    p = tmp_path / "XTRA.csv"
    p.write_text(content, encoding="utf-8")

    df = clean_raw(read_raw(spark, str(p)), ticker="XTRA")
    # header normalization strips whitespace/newlines; unknown name kept
    assert "Ghi chú" in df.columns
    row = df.collect()[0]
    assert row["Ghi chú"] == "note-1"
    assert row.Close == 36500.0  # known columns still parse


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    """Watermarked dropDuplicates on a stream with injected duplicate
    event_ids must emit each id exactly once and match the batch
    distinct set."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.stateful import (
        dedup_stream,
    )

    events = load_table(spark, SF_SMALL, "events").limit(200)
    dup = events.limit(50)  # re-deliver the first 50 (at-least-once)
    feed = events.unionByName(dup)
    src = str(tmp_path / "src")
    feed.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(2).write.mode("overwrite").json(src)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [r.event_id for r in spark.table("dedup_out").collect()]
    want = {r.event_id for r in events.select("event_id").distinct().collect()}
    assert len(got) == len(set(got)), "stream emitted a duplicate id"
    assert set(got) == want


def test_salted_join_rejects_dim_preserving_types(spark):
    from stock_data_warehouse_analytics_spark.operators.skew import salted_join
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    o = load_table(spark, SF_SMALL, "orders")
    n = load_table(spark, SF_SMALL, "nation").withColumnRenamed(
        "n_nationkey", "o_custkey"
    )
    import pytest as _pytest

    for how in ("right", "full", "left_semi"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(o, n, "o_custkey", how=how)


def test_upsert_rollup_rejects_oversized_delta(spark, tmp_path, monkeypatch):
    from stock_data_warehouse_analytics_spark.streaming import incremental
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    monkeypatch.setattr(incremental, "MAX_DELTA_DAYS", 2)
    events = load_table(spark, SF_SMALL, "events")  # spans ~30 days
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MAX_DELTA_DAYS"):
        incremental.upsert_daily_rollup(spark, events, str(tmp_path / "roll"))


def test_stateful_ams_registers_match_batch(spark, tmp_path):
    """The explicit-state AMS register operator must converge to the
    batch registers: after an availableNow run over a multi-file JSON
    dump (maxFilesPerTrigger=1 forces several micro-batches, i.e. real
    incremental state updates), the LAST update per axis j equals the
    one-shot batch Σ sign — and intermediate updates exist, proving
    the state actually carried across micro-batches."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.sketches import (
        ams_sign_columns,
    )
    from stock_data_warehouse_analytics_spark.streaming.stateful import (
        ams_register_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).repartition(3).write.mode("overwrite").json(src)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        ams_register_stream(stream)
        .writeStream.format("memory")
        .queryName("ams_state_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table("ams_state_out").collect()
    # >16 rows ⇒ at least one axis was updated in more than one
    # micro-batch (incremental state, not a single-batch aggregate)
    assert len(rows) > 16
    got = {}
    for r in rows:  # final update = the one with the max n_events
        if r.j not in got or r.n_events > got[r.j][1]:
            got[r.j] = (r.z, r.n_events)
    want = {
        r.j: (r.z, r.n)
        for r in ams_sign_columns(events)
        .groupBy("j")
        .agg(
            F.sum("s").cast("long").alias("z"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(range(16)) == set(want)
    assert got == want


def test_stateful_sessionizer_matches_batch(spark, tmp_path):
    """Stream ≡ batch for the event-time-timeout sessionizer: feed the
    events as THREE time-ordered files (range-partitioned on ts, so
    micro-batches arrive chronologically — the sessionizer's stated
    ordering contract), run availableNow, and compare emitted closed
    sessions against the batch gaps-and-islands sessions.  Sessions
    closed by a SUCCESSOR event must all emit; the user's final
    session emits only if the final watermark passed its end + gap
    (event-time timeout) — the test derives the exactly-expected set
    from those rules, so it also pins whether the engine fires
    timeouts on the terminal no-data batch."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.stateful import (
        _SESS_GAP_US,
        sessionize_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    # Feed the stream as three files in GUARANTEED chronological order:
    # FileStreamSource orders pending files by modification time, so a
    # single range-partitioned write (identical mtimes) can process the
    # newest slice first — every earlier file then arrives beyond the
    # watermark and is dropped as late data wholesale.  Write each time
    # slice separately and stamp ascending mtimes.
    import glob
    import os
    import shutil

    os.makedirs(src)
    cuts = events.select(
        F.expr("percentile_approx(ts, array(0.34, 0.67), 10000)").alias("c")
    ).collect()[0]["c"]
    lo = F.col("ts") <= F.lit(cuts[0])
    mid = (F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))
    hi = F.col("ts") > F.lit(cuts[1])
    for i, pred in enumerate([lo, mid, hi]):
        stage = str(tmp_path / f"stage{i}")
        (
            events.filter(pred)
            .select(
                "event_id",
                F.date_format(
                    "ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
                ).alias("ts"),
                "user_id",
                "event_type",
                "value",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .json(stage)
        )
        (part,) = glob.glob(f"{stage}/part-*.json")
        dst = f"{src}/{i:03d}.json"
        shutil.move(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    # foreachBatch, not the memory sink: the memory table was observed
    # dropping all but the final batch's rows under availableNow here
    # (the per-batch sink numOutputRows were correct) — foreachBatch
    # collects on the driver and is the ground truth
    emitted: list[tuple] = []

    def _collect(df, _bid):
        emitted.extend(
            (r.user_id, r.start_us, r.end_us, r.n_events, r.total_cents)
            for r in df.collect()
        )

    q = (
        sessionize_stream(stream)
        .writeStream.foreachBatch(_collect)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = set(emitted)
    assert len(emitted) == len(got)  # closed sessions emit exactly once

    # batch truth: gaps-and-islands sessions at the same 6 h gap
    from pyspark.sql.window import Window

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        us.alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(
            F.lag(us).over(w).isNull()
            | ((us - F.lag(us).over(w)) > _SESS_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.withColumn(
        "seq",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    )
    batch = (
        sess.groupBy("user_id", "seq")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in batch:
        by_user.setdefault(r.user_id, []).append(r)
    max_us = events.agg(F.max(us)).collect()[0][0]
    final_wm_us = max_us - 60 * 1_000_000  # the 1-minute delay
    successor_closed, timeout_eligible = set(), set()
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r.start_us)
        for i, r in enumerate(rows):
            t = (u, r.start_us, r.end_us, r.n_events, r.total_cents)
            if i < len(rows) - 1:
                successor_closed.add(t)
            elif r.end_us + _SESS_GAP_US < final_wm_us:
                timeout_eligible.add(t)
    assert len(got) > 0
    # every successor-closed session must emit, exactly
    assert successor_closed <= got, (
        len(successor_closed - got),
        "successor-closed sessions missing from the stream output",
    )
    # nothing outside the two legitimate closure sets may emit
    assert got <= successor_closed | timeout_eligible
    # pin the terminal-timeout behavior explicitly so a silent engine
    # change (no-data batch on availableNow) fails loudly
    fired_terminal = bool(got & timeout_eligible)
    assert got == successor_closed | (timeout_eligible if fired_terminal
                                      else set())


def test_sessionize_stream_rejects_watermark_at_or_over_gap(spark):
    """The sessionizer's delay-vs-gap guard (r7 ADVICE #2):
    _sess_update folds within-watermark late events into the open
    session via start=min(start, us), which silently MERGES sessions
    batch logic splits once lateness >= the gap — so sessionize_stream
    must reject such a watermark instead of diverging from its batch
    twin.  Also pins the delay-string parser's units."""
    import pytest as _pytest

    from stock_data_warehouse_analytics_spark.streaming.stateful import (
        _SESS_GAP_US,
        _parse_delay_us,
        sessionize_stream,
    )

    assert _parse_delay_us("1 minute") == 60_000_000
    assert _parse_delay_us("30 seconds") == 30_000_000
    assert _parse_delay_us("2 hours") == 7_200_000_000
    with _pytest.raises(ValueError):
        _parse_delay_us("one eternity")

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.col("value").alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.lit(1.0).alias("value"),
        )
    )
    gap_h = _SESS_GAP_US // 3_600_000_000
    with _pytest.raises(ValueError, match="watermark delay"):
        sessionize_stream(stream, watermark=f"{gap_h} hours")
    with _pytest.raises(ValueError, match="watermark delay"):
        sessionize_stream(stream, watermark=f"{gap_h + 1} hours")
    # under the gap is accepted (plan construction succeeds lazily)
    sessionize_stream(stream, watermark="1 hour")
