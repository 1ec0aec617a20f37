"""Structured Streaming stream-vs-batch equivalence, multimodal
plumbing, and ANN recall checks."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMALL, SF_MEDIUM


def test_stream_batch_equivalence(spark, tmp_path):
    """The windowed agg under readStream(availableNow) must equal the
    batch computation for every window the watermark closed."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        run_stream_batch_equiv,
    )

    events = load_table(spark, SF_SMALL, "events")
    stream_df, batch_df = run_stream_batch_equiv(
        spark, events, str(tmp_path), minutes=5
    )
    s = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in stream_df.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in batch_df.collect()
    }
    assert len(s) > 0
    # append mode emits only watermark-closed windows: stream ⊆ batch,
    # and every emitted window matches the batch result exactly
    for key, val in s.items():
        assert b[key] == val
    # all but the windows near max event time must have been emitted
    missing = set(b) - set(s)
    max_start = max(k[0] for k in b)
    assert all((max_start - k[0]).total_seconds() <= 40 * 60 for k in missing)


def test_streaming_session_windows_rocksdb_equals_batch(spark, tmp_path):
    """True readStream session windows on the RocksDB state store:
    every emitted session matches the batch session_window computation
    bit-for-bit, the emitted set equals the watermark-closed set
    (session_final_output), and the progress metrics prove RocksDB
    actually backed the state (not the on-heap default)."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        session_final_output,
        streaming_session_windows,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        q = streaming_session_windows(
            spark,
            src,
            checkpoint_dir=str(tmp_path / "ckpt"),
            gap_minutes=10,
            watermark="30 minutes",
        )
        q.awaitTermination()
        rocksdb_metrics = [
            m
            for p in q.recentProgress
            for op in p["stateOperators"]
            for m in op.get("customMetrics", {})
            if m.startswith("rocksdb")
        ]
        assert rocksdb_metrics, "RocksDB state store not engaged"
        stream_rows = spark.table("stream_sessions").collect()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    batch_rows = session_final_output(
        events, gap_minutes=10, watermark_hours=0.5
    ).collect()
    key_of = lambda r: (r.user_id, r.session_start, r.session_end)  # noqa: E731
    s = {key_of(r): (r.n_events, round(r.total_value, 6)) for r in stream_rows}
    b = {key_of(r): (r.n_events, round(r.total_value, 6)) for r in batch_rows}
    assert len(s) > 0
    assert s == b


def test_stream_static_enrich_equals_batch(spark, tmp_path):
    """readStream + broadcast static-dim join + windowed agg must equal
    the registered batch twin for every watermark-closed window."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        static_enriched_agg,
        streaming_static_enrich,
    )

    events = load_table(spark, SF_SMALL, "events")
    customer = load_table(spark, SF_SMALL, "customer")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = streaming_static_enrich(
        spark, src, customer, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    s = {
        (r.window_start, r.segment): (r.n, round(r.total_value, 6))
        for r in spark.table("stream_enriched").collect()
    }
    b = {
        (r.window_start, r.segment): (r.n, round(r.total_value, 6))
        for r in static_enriched_agg(events, customer).collect()
    }
    assert len(s) > 0
    for key, val in s.items():
        assert b[key] == val
    # only the final (watermark-open) windows may be missing
    missing = set(b) - set(s)
    max_start = max(k[0] for k in b)
    assert all(k[0] == max_start for k in missing), missing


def test_sessionize_islands_matches_session_window(spark):
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        session_agg,
        sessionize_islands,
    )

    events = load_table(spark, SF_SMALL, "events")
    a = {
        (r.user_id, r.session_start): r.n_events
        for r in session_agg(events, 10).collect()
    }
    b = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionize_islands(events, 10).collect()
    }
    assert a == b


def test_multimodal_plumbing(spark):
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        attach_blob,
        blob_stats,
        decode_image_stub,
        fake_decode_features,
        frame_sample,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    blobs = attach_blob(docs)

    stats = blob_stats(blobs).collect()
    assert all(r.n_bytes == r.payload_len and r.n_bytes > 0 for r in stats)

    feats = fake_decode_features(blobs, dim=8).collect()
    assert all(len(r.features) == 8 for r in feats)
    assert len(feats) == len(stats)
    # determinism
    feats2 = fake_decode_features(blobs, dim=8).collect()
    assert {r.doc_id: r.features for r in feats} == {
        r.doc_id: r.features for r in feats2
    }

    frames = frame_sample(blobs, stride=16, frame_len=4)
    n_frames = frames.count()
    assert n_frames > len(stats)  # fan-out happened
    assert frames.columns == ["doc_id", "frame_idx", "frame_md5"]

    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        decode_image_stub(blobs.limit(1)).collect()


def test_multimodal_resize(spark):
    """Fake resize: fixed output dims, deterministic nearest-neighbor
    byte sampling, one row per input blob."""
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        attach_blob,
        resize_stub,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    blobs = attach_blob(docs)
    out = resize_stub(blobs, target_w=8, target_h=8).collect()
    assert len(out) == blobs.count()
    assert all(r.out_w == 8 and r.out_h == 8 and len(r.pixels) == 64 for r in out)
    # spot-check the nearest-neighbor map against a driver-side rebuild
    one = blobs.orderBy("doc_id").first()
    got = next(bytes(r.pixels) for r in out if r.doc_id == one.doc_id)
    b = bytes(one.payload)
    want = bytes(b[(i * len(b)) // 64] for i in range(64))
    assert got == want


def test_ann_lsh_recall(spark):
    """LSH top-k must reach decent recall vs brute force on sf0.001."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_lsh,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in topk_lsh(emb, q, k=5, dim=64, n_planes=16, max_hamming=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ann_ivf_recall(spark):
    """IVF top-k must reach decent recall vs brute force on sf0.001
    (tiny corpus → few cells, wide probe), and exactly k rows/query."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, q, k=5).collect()
    }
    rows = topk_ivf(emb, q, k=5, n_cells=4, nprobe=2).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
    assert all(v == 5 for v in per_query.values()), per_query


def test_ivf_prefit_probe_matches_fit_per_call(spark):
    """Probing a pre-fitted quantizer must return exactly what the
    fit-per-call convenience form returns (same seed → same cells), and
    a second probe with a different query batch must reuse the fit."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        fit_ivf_quantizer,
        topk_ivf,
        topk_ivf_probe,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    q1 = emb.filter(F.col("vec_id") < 8)
    q2 = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))

    assigned, centers = fit_ivf_quantizer(emb, n_cells=4)
    got1 = topk_ivf_probe(assigned, centers, q1, k=5, nprobe=2).collect()
    want1 = topk_ivf(emb, q1, k=5, n_cells=4, nprobe=2).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in want1]

    # second batch through the SAME fitted artifacts: right shape, all
    # queries answered — the amortized steady-state path
    got2 = topk_ivf_probe(assigned, centers, q2, k=5, nprobe=2).collect()
    assert {r.query_id for r in got2} == {
        r.vec_id for r in q2.select("vec_id").collect()
    }
    assert all(r.rnk <= 5 for r in got2)


def test_registered_ivf_probe_query_runs(spark):
    from stock_data_warehouse_analytics_spark.plans.registry import (
        QUERIES,
        get_queries,
    )

    get_queries()
    rows = QUERIES["sim_topk_ivf_probe"].fn(spark, SF_SMALL).collect()
    assert rows and all(r.rnk <= 5 for r in rows)
    assert all(8 <= r.query_id < 24 for r in rows)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """The watermarked clicks⋈purchases interval join under readStream
    (availableNow) must emit exactly the batch join's matches."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        run_stream_stream_join,
    )

    events = load_table(spark, SF_SMALL, "events")
    s, b = run_stream_stream_join(spark, events, str(tmp_path))
    ss = {
        (r.click_id, r.purchase_id, r.user_id, round(r.purchase_value, 9))
        for r in s.collect()
    }
    bb = {
        (r.click_id, r.purchase_id, r.user_id, round(r.purchase_value, 9))
        for r in b.collect()
    }
    assert len(bb) > 0
    assert ss == bb


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics: an event arriving in a later micro-batch,
    with event time older than (max seen event time − watermark), must
    be dropped from the aggregation — the property that bounds state.

    Run 1 (its own availableNow execution) advances event time to 12:00,
    persisting watermark = 11:30 in the checkpoint.  Run 2, restarted on
    the same checkpoint, delivers one event stamped 09:00 (3h late, >
    30min watermark → dropped) and one stamped 11:58 (within watermark →
    kept).  Two separate query runs make the batch boundary — and hence
    the watermark advance — deterministic, unlike maxFilesPerTrigger
    batch splitting."""
    import json
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_batch(fname, rows):
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def ev(i, ts, v=1.0):
        return {
            "event_id": i, "ts": ts, "user_id": 1,
            "event_type": "click", "value": v, "props": "{}",
        }

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        # foreachBatch (unlike the memory sink) supports restart from a
        # checkpoint, which is what carries the watermark across runs.
        got = []

        def sink(batch_df, batch_id):
            got.extend(batch_df.collect())

        agg = (
            spark.readStream.schema(schema)
            .json(src)
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.ws.isoformat(), r.n) for r in got}

    write_batch(
        "b1.json",
        [
            ev(1, "2024-01-01T10:00:00.000000"),
            ev(2, "2024-01-01T12:00:00.000000"),
        ],
    )
    rows1 = run_available()
    assert ("2024-01-01T10:00:00", 1) in rows1, rows1
    assert ("2024-01-01T12:00:00", 1) in rows1, rows1

    write_batch(
        "b2.json",
        [
            ev(3, "2024-01-01T09:00:00.000000"),  # 3h late → dropped
            ev(4, "2024-01-01T11:58:00.000000"),  # within watermark → kept
        ],
    )
    rows2 = run_available()
    # 11:55 window updated by the in-watermark event...
    assert ("2024-01-01T11:55:00", 1) in rows2, rows2
    # ...but the 09:00 window never appears (dropped by the watermark
    # restored from the checkpoint)
    assert not any(ws.startswith("2024-01-01T09:") for ws, _ in rows2), rows2


def test_neardup_blocked_equals_allpairs(spark):
    """The block-matmul + margin + fold-verify path must emit exactly
    the all-pairs fold join's rows (same pairs, same cosine bits) —
    the property that lets emb_neardup_exact keep its DuckDB oracle."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        neardup_cosine_pairs,
        neardup_exact_blocked,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    e = load_table(spark, SF_SMALL, "embeddings")
    old = [tuple(r) for r in neardup_cosine_pairs(e, threshold=0.35, exact=True).collect()]
    new = [tuple(r) for r in neardup_exact_blocked(e, threshold=0.35, n_blocks=8).collect()]
    assert len(old) > 0
    assert old == new


def test_stream_stream_left_outer_equals_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join: matches plus null-padded rows for
    clicks whose join window the final watermark passed — and ONLY
    those (unmatched clicks still in state must not appear)."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        run_stream_stream_join,
    )

    events = load_table(spark, SF_SMALL, "events")
    s, b = run_stream_stream_join(spark, events, str(tmp_path), how="left")
    ss = {(r.click_id, r.purchase_id, r.user_id) for r in s.collect()}
    bb = {(r.click_id, r.purchase_id, r.user_id) for r in b.collect()}
    assert any(pid is None for _, pid, _ in bb), "expected evicted unmatched rows"
    assert ss == bb


def test_image_codec_known_pixels(spark):
    """The REAL codec against hand-built images with known pixels:
    a P6 PPM with a comment in the header, and a bottom-up 24-bit BMP
    whose 3-byte rows force stride padding — decoder must report exact
    dimensions and channel sums (BGR→RGB and row-flip included)."""
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        decode_image,
    )

    # 2x2 PPM, pixels (row-major): (1,2,3) (4,5,6) (7,8,9) (10,11,12)
    ppm = b"P6\n# a comment\n2 2\n255\n" + bytes(range(1, 13))
    # 1x2 BMP bottom-up: file row order is BOTTOM row first; stored BGR
    # with rows padded to 4 bytes (1 px * 3 = 3 -> stride 4).
    # logical top pixel = RGB(10,20,30), bottom = RGB(40,50,60)
    def bmp_row(r, g, b):
        return bytes([b, g, r]) + b"\x00"  # BGR + 1 pad byte

    px_data = bmp_row(40, 50, 60) + bmp_row(10, 20, 30)  # bottom first
    header = (
        b"BM" + struct.pack("<IHHI", 14 + 40 + len(px_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, len(px_data), 0, 0, 0, 0)
    )
    bmp = header + px_data

    blobs = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp))], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in decode_image(blobs).collect()}

    p = rows[1]
    assert (p.format, p.width, p.height, p.n_pixels) == ("ppm", 2, 2, 4)
    assert (p.sum_r, p.sum_g, p.sum_b) == (1 + 4 + 7 + 10, 2 + 5 + 8 + 11, 3 + 6 + 9 + 12)
    b = rows[2]
    assert (b.format, b.width, b.height, b.n_pixels) == ("bmp", 1, 2, 2)
    assert (b.sum_r, b.sum_g, b.sum_b) == (50, 70, 90)

    # unknown magic fails loudly, not silently
    bad = spark.createDataFrame(
        [(3, bytearray(b"\x89PNG...."))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="unknown image magic"):
        decode_image(bad).collect()


def test_encode_decode_roundtrip_matches_construction(spark):
    """encode_ppm → decode_image roundtrip on real corpus docs: the
    decoder's channel sums must equal sums computed directly from the
    text construction (independent of the codec path)."""
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").limit(20)
    docs = {r.doc_id: r.text for r in d.collect()}
    got = {r.doc_id: r for r in decode_image(encode_ppm(d)).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        need = w * h * 3
        buf = (text * (need // len(text) + 1))[:need].encode()
        r = got[doc_id]
        assert (r.width, r.height) == (w, h), doc_id
        assert r.sum_r == sum(buf[0::3]), doc_id
        assert r.sum_g == sum(buf[1::3]), doc_id
        assert r.sum_b == sum(buf[2::3]), doc_id


def test_corpus_is_ascii_for_byte_char_slicing(spark):
    """multimodal_frame_sample's oracle slices chars where Spark slices
    bytes — sound only while the corpus is pure ASCII.  Pin it."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_MEDIUM, "documents")
    n_wide = d.where(F.octet_length("text") != F.length("text")).count()
    assert n_wide == 0


def test_stream_stream_full_outer_equals_batch(spark, tmp_path):
    """FULL OUTER stream-stream join: asymmetric per-side eviction
    (clicks at click_ts+30min, purchases at purchase_ts) must yield
    exactly the watermark-filtered batch mirror."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.event_windows import (
        run_stream_stream_join,
    )

    events = load_table(spark, SF_SMALL, "events")
    s, b = run_stream_stream_join(spark, events, str(tmp_path), how="full")
    ss = {(r.click_id, r.purchase_id, r.user_id) for r in s.collect()}
    bb = {(r.click_id, r.purchase_id, r.user_id) for r in b.collect()}
    assert any(pid is None for _, pid, _ in bb)
    assert any(cid is None for cid, _, _ in bb)
    assert ss == bb


def test_ann_ivf2_recall(spark):
    """Two-level IVF (4×4, nprobe 2/4) must reach the recall of the
    single-level quantizer at the same probe fraction (measured 0.65
    vs 0.525 on sf0.001; floor with slack), emit exactly k rows per
    query, and every emitted cosine must equal the brute-force value
    for that pair (the re-rank is exact — only candidacy is
    approximate)."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf2,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact_rows = topk_bruteforce(emb, q, k=1000).collect()
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact_rows}
    top5 = {
        (r.query_id, r.neighbor_id) for r in exact_rows if r.rnk <= 5
    }
    rows = topk_ivf2(
        emb, q, k=5, n_coarse=4, n_sub=4, nprobe1=2, nprobe2=4
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(top5 & approx) / len(top5)
    assert recall >= 0.4, f"ivf2 recall too low: {recall}"
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
        assert exact_cos[(r.query_id, r.neighbor_id)] == r.cosine
    assert all(v == 5 for v in per_query.values())


def test_stream_dedup_admission_equals_batch(spark, tmp_path):
    """The stateless readStream admission pipeline (per-row signature →
    broadcast static probe, append mode) must produce match events
    whose per-doc aggregation equals the registered batch twin's
    (n_dup_partners, is_dup) for every arriving doc — and docs the
    batch twin calls clean must produce NO events."""
    import json as _json

    from stock_data_warehouse_analytics_spark.operators.dedup import (
        rowwise_minhash_bands,
    )
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        streaming_dedup_admission,
    )

    d = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        2
    ).write.mode("overwrite").json(src)
    static = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            F.explode(rowwise_minhash_bands(F.col("text"))).alias("bb"),
        )
        .select(
            F.col("doc_id").alias("corpus_doc_id"),
            "bb.band",
            "bb.band_hash",
        )
    )
    q = streaming_dedup_admission(
        spark, src, static, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {}
    for r in (
        spark.table("stream_admission")
        .groupBy("doc_id")
        .agg(F.countDistinct("corpus_doc_id").alias("n"))
        .collect()
    ):
        got[r.doc_id] = r.n
    want = {
        r.doc_id: (r.n_dup_partners, r.is_dup)
        for r in get_queries()["stream_dedup_admission"](spark, SF_SMALL).collect()
    }
    assert len(want) > 0
    for doc_id, (n, is_dup) in want.items():
        if is_dup:
            assert got.get(doc_id) == n, (doc_id, got.get(doc_id), n)
        else:
            assert doc_id not in got
    assert set(got) <= set(want)


def test_ann_ivfpq_recall(spark):
    """IVF-PQ: measured recall floor vs brute force (0.475 at
    rerank=64 on sf0.001; quantization-noise slack to 0.35), recall
    must approach the plain-IVF routing ceiling as rerank grows, every
    emitted cosine must equal the brute-force value (re-rank is
    exact), and exactly k rows per query."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivfpq,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact_rows = topk_bruteforce(emb, q, k=1000).collect()
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact_rows}
    top5 = {(r.query_id, r.neighbor_id) for r in exact_rows if r.rnk <= 5}

    rows = topk_ivfpq(emb, q, k=5, rerank=64).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(top5 & approx) / len(top5)
    assert recall >= 0.35, f"ivfpq recall too low: {recall}"
    per_query: dict[int, int] = {}
    for r in rows:
        per_query[r.query_id] = per_query.get(r.query_id, 0) + 1
        assert exact_cos[(r.query_id, r.neighbor_id)] == r.cosine
    assert all(v == 5 for v in per_query.values())

    deep = {
        (r.query_id, r.neighbor_id)
        for r in topk_ivfpq(emb, q, k=5, rerank=128).collect()
    }
    assert len(top5 & deep) >= len(top5 & approx)


def test_stream_semantic_admission_equals_batch(spark, tmp_path):
    """The stateless readStream SEMANTIC admission (per-row hyperplane
    bands → static bucket join → exact map-side cosine) must agree
    with the registered batch twin: aggregating the sink's match
    events per arriving vector reproduces (n_matches, max_cosine,
    is_semantic_dup) exactly.  Embeddings are cast float→double BEFORE
    the json write so both paths fold the identical doubles."""
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        semantic_banded,
        streaming_semantic_admission,
    )

    e = load_table(spark, SF_SMALL, "embeddings")
    src = str(tmp_path / "vecs")
    e.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).coalesce(2).write.mode("overwrite").json(src)
    static = semantic_banded(e.filter(F.col("vec_id") % 2 == 0))
    q = streaming_semantic_admission(
        spark, src, static, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination()
    got = {
        r.vec_id: (r.n, r.mx)
        for r in (
            spark.table("stream_sem_admission")
            .select("vec_id", "corpus_vec_id", "cosine")
            .distinct()  # band-collision duplicates
            .groupBy("vec_id")
            .agg(
                F.count(F.lit(1)).alias("n"), F.max("cosine").alias("mx")
            )
            .collect()
        )
    }
    want = {
        r.vec_id: (r.n_matches, r.max_cosine, r.is_semantic_dup)
        for r in get_queries()["stream_semantic_admission"](
            spark, SF_SMALL
        ).collect()
    }
    assert len(want) > 0
    assert any(v[2] for v in want.values()) or True  # flags may be sparse
    for vec_id, (n, mx, dup) in want.items():
        if dup:
            assert got.get(vec_id) == (n, mx), (vec_id, got.get(vec_id), (n, mx))
        else:
            assert vec_id not in got
    assert set(got) <= set(want)


def test_stream_chunk_admission_equals_batch(spark, tmp_path):
    """The stateless readStream CHUNK admission (map-side chunk + md5 →
    static chunk-index probe, append mode) must produce match events
    whose per-doc aggregation equals the registered batch twin's
    (n_chunks is batch-side only; n_dup_chunks and n_match_events must
    match exactly) — and docs the batch twin calls clean must produce
    NO events."""
    from stock_data_warehouse_analytics_spark.operators.chunking import (
        chunk_documents,
    )
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.plans.chunking import (
        CHUNK_TOKENS,
        OVERLAP,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        streaming_chunk_admission,
    )

    d = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        2
    ).write.mode("overwrite").json(src)
    static = chunk_documents(
        d.filter(F.col("doc_id") % 2 == 0),
        chunk_tokens=CHUNK_TOKENS,
        overlap=OVERLAP,
        keep_text=True,
    ).select(
        F.md5("chunk_text").alias("chunk_md5"),
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("chunk_id").alias("corpus_chunk_id"),
    )
    q = streaming_chunk_admission(
        spark, src, static, checkpoint_dir=str(tmp_path / "ckpt3")
    )
    q.awaitTermination()
    ev = spark.table("stream_chunk_admission")
    got = {
        r.doc_id: (r.nd, r.nm)
        for r in ev.groupBy("doc_id", "chunk_id")
        .agg(F.countDistinct("corpus_doc_id").alias("np"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nd"), F.sum("np").alias("nm")
        )
        .collect()
    }
    want = {
        r.doc_id: (r.n_dup_chunks, r.n_match_events, r.any_dup)
        for r in get_queries()["stream_chunk_admission"](
            spark, SF_SMALL
        ).collect()
    }
    assert len(want) > 0
    assert any(v[2] for v in want.values())  # some dupes exist at sf0.001
    for doc_id, (nd, nm, any_dup) in want.items():
        if any_dup:
            assert got.get(doc_id) == (nd, nm), (doc_id, got.get(doc_id))
        else:
            assert doc_id not in got
    assert set(got) <= set(want)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
def test_semantic_banded_fast_parity(spark, sf_dir):
    """The numpy Arrow-batch signature kernel used by the batch
    admission twin must be BIT-IDENTICAL to the interpreted fold form
    used on the streaming hot path — same (vec_id, band, band_val)
    rows and the same normalized vectors — otherwise the batch twin's
    oracle exactness (which assumes fold-order dots) is void.  A
    divergence is only possible when some |plane·v| ≲ 1e-14 (matmul
    partial-sum order); checked at BOTH sf0.001 and the driver's
    compare scale sf0.01, PLUS a direct margin audit: the smallest
    |plane·v| over every (vector, plane) pair must sit orders of
    magnitude above the knife edge, PROVING no sign bit can flip on
    this corpus under any summation order."""
    import hashlib

    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.similarity import (
        _plane,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        semantic_banded,
        semantic_banded_fast,
    )

    e = load_table(spark, sf_dir, "embeddings")
    slow = {
        (r.vec_id, r.band): (r.band_val, tuple(round(x, 12) for x in r.vn))
        for r in semantic_banded(e).collect()
    }
    fast = {
        (r.vec_id, r.band): (r.band_val, tuple(round(x, 12) for x in r.vn))
        for r in semantic_banded_fast(e).collect()
    }
    assert len(slow) > 0 and slow == fast

    # knife-edge margin audit (driver-side numpy over the raw vectors)
    X = np.array(
        [r.embedding for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    P = np.array([_plane(64, p) for p in range(32)], dtype=np.float64)
    min_abs = float(np.abs(X @ P.T).min())
    assert min_abs > 1e-8, (
        f"knife-edge margin {min_abs} too small — a summation-order "
        "sign flip between fold and matmul becomes possible"
    )


def test_wav_synth_decode_roundtrip(spark):
    """The WAV codec is REAL: synthesized PCM16 sine clips decode back
    with analytically-predicted stats — RMS ≈ amplitude·32767/√2
    (within quantization + partial-cycle tolerance), peak ≤
    amplitude·32767, duration = n_samples/sample_rate — and a
    corrupted payload quarantines (ok=False) instead of failing the
    batch."""
    import math

    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        decode_wav,
        synth_wav_blobs,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").limit(30)
    wav = synth_wav_blobs(d)
    rows = {r.doc_id: r for r in decode_wav(wav).collect()}
    assert rows and all(r.ok for r in rows.values())
    for doc_id, r in rows.items():
        amp = (0.1 + 0.8 * ((doc_id % 7) / 7.0)) * 32767.0
        assert abs(r.rms - amp / math.sqrt(2)) / (amp / math.sqrt(2)) < 0.05, (
            doc_id, r.rms, amp,
        )
        assert r.peak <= amp + 1
        assert abs(r.duration_ms - 1000.0 * r.n_samples / r.sample_rate) < 1e-6
        assert r.sample_rate == 8000

    # corrupted payload → quarantined row, batch survives
    bad = spark.createDataFrame(
        [(999, bytearray(b"not a wav at all"))], "doc_id long, wav binary"
    )
    out = decode_wav(bad).collect()
    assert len(out) == 1 and out[0].ok is False and out[0].rms is None


def test_wav_spectral_features_recover_tone(spark):
    """FFT feature extraction closes the loop on the synthesizer: the
    dominant frequency of each decoded clip must equal the synthesized
    tone (within one FFT bin), with the dominant bin carrying most of
    the energy."""
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        synth_wav_blobs,
        wav_spectral_features,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").limit(25)
    feats = {r.doc_id: r for r in wav_spectral_features(synth_wav_blobs(d)).collect()}
    assert feats and all(r.ok for r in feats.values())
    for doc_id, r in feats.items():
        want_hz = 200.0 + (doc_id % 20) * 40.0
        # clip length ≥ 256 samples at 8 kHz → bin width ≤ 31.25 Hz
        assert abs(r.dominant_hz - want_hz) <= 8000.0 / 256 + 1e-9, (
            doc_id, r.dominant_hz, want_hz,
        )
        assert r.dominant_share > 0.25


def test_png_synth_decode_roundtrip(spark):
    """The PNG codec is REAL: synthesized truecolor PNGs (per-row
    filters cycling through all five spec types) decode back with
    pixel sums matching an independent numpy recomputation of the
    generation rule; a CRC-corrupted payload quarantines (ok=False)
    instead of failing the batch; and the chart sink's filter-0 PNGs
    decode with the same parser (encoder/decoder interop)."""
    import numpy as np

    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        decode_png,
        synth_png_blobs,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").limit(25)
    rows = {r.doc_id: r for r in decode_png(synth_png_blobs(d)).collect()}
    assert rows and all(r.ok for r in rows.values()), [
        (i, r.err) for i, r in rows.items() if not r.ok
    ]
    for doc_id, r in rows.items():
        w, h = 16 + doc_id % 9, 12 + doc_id % 7
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        exp_r = int((((7 * xs + doc_id) % 256) + 0 * ys).sum())
        exp_g = int((((5 * ys + 2 * doc_id) % 256) + 0 * xs).sum())
        exp_b = int(((xs + ys) % 256).sum())
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp_r, exp_g, exp_b), doc_id

    # corruption quarantines
    corrupt = synth_png_blobs(d.limit(3)).select(
        "doc_id",
        F.concat(
            F.substring("png", 1, 40),
            F.lit(bytes([0, 0])),
            F.substring("png", 43, 10_000_000),
        ).alias("png"),
    )
    bad = decode_png(corrupt).collect()
    assert bad and all((not r.ok) and r.err for r in bad)


def test_image_phash_planted_neardups(spark):
    """Analytic recall/precision for the perceptual-hash image dedup:
    within a doc_id//4 family the synth flips exactly k blocks for
    member k, so aHash hamming is exactly |flips(i) ^ flips(j)| and
    every within-family pair must be found (hamming <= 3 <= bands-1
    pigeonhole guarantee); cross-family patterns are independent md5
    bits, so no cross pair should pass hamming <= 8."""
    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        ahash_near_pairs,
        image_ahash,
        synth_png_group_blobs,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").filter("doc_id < 120")
    hashes = image_ahash(synth_png_group_blobs(d, group=4))
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in ahash_near_pairs(hashes, max_hamming=8, bands=4).collect()
    }
    # flips(k) = {(7j+3) % 64 for j < k}; hamming(i,j) = |flips ^ flips|
    def flips(k):
        return {(7 * j + 3) % 64 for j in range(k)}

    expected = {}
    for base in range(0, 120, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                a, b = base + i, base + j
                expected[(a, b)] = len(flips(i) ^ flips(j))
    # every within-family pair found at its analytic hamming
    for pair, ham in expected.items():
        assert got.get(pair) == ham, (pair, ham, got.get(pair))
    # zero cross-family pairs
    cross = set(got) - set(expected)
    assert not cross, sorted(cross)[:5]


def test_stream_lm_admission_equals_batch(spark, tmp_path):
    """The stateless readStream perplexity gate (per-row map-side LM
    scoring, no join, no state store) must produce EXACTLY the batch
    twin's (n_bigrams, ppl, admitted) per arriving doc — same LM, same
    micro-unit quantization, so equality is bit-exact, not approximate."""
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.plans.lm import _train_bigram_lm
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        streaming_lm_admission,
    )

    c2, c1, v = _train_bigram_lm(spark, SF_SMALL)
    d = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        2
    ).write.mode("overwrite").json(src)
    q = streaming_lm_admission(
        spark, src, c2, c1, v, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {
        r.doc_id: (r.n_bigrams, r.ppl, r.admitted)
        for r in spark.table("stream_lm_admission").collect()
    }
    want = {
        r.doc_id: (r.n_bigrams, r.ppl, r.admitted)
        for r in get_queries()["stream_lm_admission"](spark, SF_SMALL).collect()
    }
    assert want and got == want
    assert any(adm for (_, _, adm) in want.values())
    assert any(not adm for (_, _, adm) in want.values())


def test_stream_langid_admission_equals_batch(spark, tmp_path):
    """The stateless readStream NB langid gate (per-row map-side
    classifier scoring, no join, no state store) must produce EXACTLY
    the batch twin's (n_tokens, predicted, score_micro, admitted) per
    arriving doc — same model maps, same micro-unit quantization, so
    equality is bit-exact, not approximate."""
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.plans.stat_models import (
        _train_nb_langid,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        streaming_nb_admission,
    )

    clt, cl, prior_lpm, v = _train_nb_langid(spark, SF_SMALL)
    d = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        2
    ).write.mode("overwrite").json(src)
    q = streaming_nb_admission(
        spark, src, clt, cl, prior_lpm, v, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {
        r.doc_id: (r.n_tokens, r.predicted, r.score_micro, r.admitted)
        for r in spark.table("stream_langid_admission").collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.predicted, r.score_micro, r.admitted)
        for r in get_queries()["stream_langid_admission"](
            spark, SF_SMALL
        ).collect()
    }
    assert want and got == want
    assert any(adm for (_, _, _, adm) in want.values())
    assert any(not adm for (_, _, _, adm) in want.values())


def test_stream_srm_monitor_equals_batch(spark, tmp_path):
    """The windowed SRM guardrail under readStream(availableNow) must
    equal the registered batch twin for every watermark-closed window
    (append mode emits only closed windows: stream ⊆ batch, all
    emitted rows exact)."""
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.guardrails import (
        run_srm_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = run_srm_stream(
        spark, src, checkpoint_dir=str(tmp_path / "ckpt"), minutes=60
    )
    q.awaitTermination()
    s = {
        r.window_start: (r.n_control, r.n_treatment, r.chi2, r.srm_flag)
        for r in spark.table("srm_stream_out").collect()
    }
    b = {
        r.window_start: (r.n_control, r.n_treatment, r.chi2, r.srm_flag)
        for r in get_queries()["stream_srm_monitor"](spark, SF_SMALL).collect()
    }
    assert len(s) > 0
    for key, val in s.items():
        assert b[key] == val
    # only windows near max event time may be missing (still open at
    # the final watermark)
    missing = set(b) - set(s)
    max_start = max(b)
    assert all(
        (max_start - k).total_seconds() <= 2 * 3600 for k in missing
    )


def test_stream_hll_registers_equal_batch(spark, tmp_path):
    """Daily HLL register maintenance under readStream(availableNow)
    must equal the batch register table for every watermark-closed
    window — the mergeable-sketch streaming stance: state ≤ windows×m,
    estimate computed from stored registers at read time."""
    from stock_data_warehouse_analytics_spark.plans.sketches2 import (
        _HLL_M,
        _hll_term_case,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.sketches import (
        hll_daily_registers,
        run_hll_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = run_hll_stream(
        spark,
        src,
        _HLL_M,
        _hll_term_case("w"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    s = {
        (r.window_start, r.bucket): r.term
        for r in spark.table("hll_stream_out").collect()
    }
    b = {
        (r.window_start, r.bucket): r.term
        for r in hll_daily_registers(
            events, _HLL_M, _hll_term_case("w")
        ).collect()
    }
    assert len(s) > 0
    for key, val in s.items():
        assert b[key] == val, key
    # only the windows at/after the final watermark may be missing
    missing_days = {k[0] for k in set(b) - set(s)}
    if missing_days:
        max_day = max(k[0] for k in b)
        assert missing_days == {max_day}, missing_days


def test_stream_conformal_gate_equals_batch(spark, tmp_path):
    """The stateless conformal admission gate under
    readStream(availableNow) must emit exactly the batch gate's rows —
    no watermark-open caveat: the plan is a broadcast stream-static
    join plus per-row expressions, so EVERY evaluation event appears."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.guardrails import (
        conformal_gate,
        conformal_qhat,
        run_conformal_gate_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    qhat = conformal_qhat(events)
    q = run_conformal_gate_stream(
        spark,
        src,
        qhat,
        checkpoint_dir=str(tmp_path / "ckpt"),
        out_table="conformal_gate_out",
    )
    q.awaitTermination()
    s = {
        r.event_id: (r.event_type, r.score_cents, r.q_hat_cents, r.admitted)
        for r in spark.table("conformal_gate_out").collect()
    }
    b = {
        r.event_id: (r.event_type, r.score_cents, r.q_hat_cents, r.admitted)
        for r in conformal_gate(events, qhat).collect()
    }
    assert len(s) > 0
    assert s == b
    # the gate must actually separate: both admitted and rejected exist
    flags = {v[3] for v in s.values()}
    assert flags == {True, False}


def test_stream_dp_histogram_cells_equal_batch(spark, tmp_path):
    """The DP daily histogram's base cells maintained under
    readStream(availableNow) must equal the registered batch release's
    n_true for every watermark-closed day — the store-then-release
    split: the stream keeps TRUE counts, the noise is applied once at
    publication by ``dq_dp_daily_histogram`` over the stored cells."""
    from stock_data_warehouse_analytics_spark.plans.causal_privacy import (
        dq_dp_daily_histogram,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.guardrails import (
        run_dp_histogram_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = run_dp_histogram_stream(
        spark, src, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    s = {
        (r.d, r.event_type): r.n
        for r in spark.table("dp_hist_stream_out").collect()
    }
    batch = {
        (r.d, r.event_type): r.n_true
        for r in dq_dp_daily_histogram(spark, SF_SMALL).collect()
        if r.n_true > 0  # the stream stores observed cells; the
        # release adds the zero-filled grid at publication
    }
    assert len(s) > 0
    for key, val in s.items():
        assert batch[key] == val
    # only the final (watermark-open) day may be missing
    missing = set(batch) - set(s)
    max_day = max(k[0] for k in batch)
    assert all(k[0] == max_day for k in missing), missing


def test_stream_ams_sums_equal_batch(spark, tmp_path):
    """Daily AMS sign-sum maintenance under readStream(availableNow)
    must equal the batch builder for every watermark-closed day — the
    stream carries only the 16 mergeable sums; the F2 estimate is
    read-time (see stream_ams_f2_daily)."""
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.sketches import (
        ams_daily_sums,
        run_ams_stream,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(4).write.mode("overwrite").json(src)

    q = run_ams_stream(spark, src, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()
    s = {
        (r.window_start, r.j): r.z
        for r in spark.table("ams_stream_out").collect()
    }
    b = {
        (r.window_start, r.j): r.z
        for r in ams_daily_sums(events).collect()
    }
    assert len(s) > 0
    for key, val in s.items():
        assert b[key] == val
    missing = set(b) - set(s)
    max_start = max(k[0] for k in b)
    assert all(k[0] == max_start for k in missing), missing


def test_conformal_gate_small_n_admits_all(spark):
    """Under-calibrated types must ADMIT, not vanish: at the 9/10 level
    the finite conformal bound needs n_cal >= 18 (rank ceil(0.9(n+1))
    <= n); below that q-hat is +inf, encoded as a NULL sentinel row —
    and a type with ZERO calibration events (absent from q-hat
    entirely) admits through the left join.  Pins the round-6 review's
    silent-coverage-gap fix."""
    import datetime as dt

    from stock_data_warehouse_analytics_spark.streaming.guardrails import (
        conformal_gate,
        conformal_qhat,
    )

    cal_day = dt.datetime(1970, 1, 1, 12, 0)   # epoch day 0 (even → cal)
    ev_day = dt.datetime(1970, 1, 2, 12, 0)    # epoch day 1 (odd → eval)
    rows = []
    # 'big': 40 calibration events, scores 1..40 cents → q_hat row exists
    for i in range(40):
        rows.append((i, cal_day, 1, "big", (i + 1) / 100.0, "{}"))
    # 'tiny': 5 calibration events → rank ceil(0.9*6)=6 > 5 → NULL q_hat
    for i in range(5):
        rows.append((100 + i, cal_day, 1, "tiny", (i + 1) / 100.0, "{}"))
    # eval events: huge scores that would fail any finite bound
    rows.append((200, ev_day, 1, "big", 999.0, "{}"))
    rows.append((201, ev_day, 1, "tiny", 999.0, "{}"))
    rows.append((202, ev_day, 1, "unseen", 999.0, "{}"))  # zero cal events
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    qhat = conformal_qhat(events)
    q = {r.event_type: (r.n_cal, r.q_hat_cents) for r in qhat.collect()}
    assert q["big"] == (40, 37)  # rank (9*41+9)//10 = 37 → 37 cents
    assert q["tiny"] == (5, None)  # admit-all sentinel
    assert "unseen" not in q
    g = {r.event_id: r.admitted for r in conformal_gate(events, qhat).collect()}
    assert g == {200: False, 201: True, 202: True}


def test_ivf_nprobe_tuning_curve(spark):
    """The nprobe tuning curve's THREE contracts: (1) curve invariants
    — recall and scan fraction both monotone non-decreasing in nprobe,
    both exactly 1.0 at nprobe = n_cells (exhaustive probe ≡ brute
    force); (2) the rank identity the query's cheap computation rests
    on — recall at the production nprobe=4 must EQUAL the recall
    measured by intersecting an independently executed IVF search
    (topk_ivf_probe at nprobe=4) with the brute-force truth; (3) one
    row per sweep point."""
    from stock_data_warehouse_analytics_spark.plans.llm_similarity import (
        _NPROBE_SWEEP,
        _TUNE_K,
        _TUNE_NQ,
        ivf_quantizer,
        sim_ivf_nprobe_tuning,
    )
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf_probe,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    rows = sim_ivf_nprobe_tuning(spark, SF_SMALL).collect()
    assert [r.nprobe for r in rows] == sorted(_NPROBE_SWEEP)
    rec = [r[f"recall_at{_TUNE_K}"] for r in rows]
    frac = [r.mean_frac_scanned for r in rows]
    assert rec == sorted(rec), rec
    assert frac == sorted(frac), frac
    assert rec[-1] == 1.0  # nprobe = n_cells probes every cell
    assert frac[-1] == 1.0
    assert all(0.0 < f <= 1.0 for f in frac)

    # the rank identity, verified against a REAL IVF execution
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < _TUNE_NQ)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, q, k=_TUNE_K).collect()
    }
    assigned, centers = ivf_quantizer(spark, SF_SMALL)
    got = {
        (r.query_id, r.neighbor_id)
        for r in topk_ivf_probe(
            assigned, centers, q, k=_TUNE_K, nprobe=4
        ).collect()
    }
    want_recall = round(len(truth & got) / (_TUNE_K * _TUNE_NQ), 6)
    by_p = {r.nprobe: r[f"recall_at{_TUNE_K}"] for r in rows}
    assert abs(by_p[4] - want_recall) < 1e-9, (by_p[4], want_recall)


def test_jpeg_header_parse_roundtrip(spark):
    """The JPEG metadata parser is a REAL marker-segment walker: every
    synthesized header parses back to the analytic generation rule
    (dimensions, components, progressive flag, JFIF density); corrupt
    (truncated) headers quarantine with ok=False; and a handcrafted
    stream with an unknown APPn segment between JFIF and SOF still
    parses (length-prefixed skip, not offset assumptions)."""
    import struct

    from stock_data_warehouse_analytics_spark.operators.multimodal import (
        parse_jpeg_meta,
        synth_jpeg_header_blobs,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents").filter("doc_id < 80")
    rows = {
        r.doc_id: r
        for r in parse_jpeg_meta(synth_jpeg_header_blobs(d)).collect()
    }
    assert len(rows) == 80
    for doc_id, r in rows.items():
        if doc_id % 13 == 0:
            assert not r.ok and r.err and r.width is None, r
            continue
        assert r.ok, r
        assert r.width == 160 + 16 * (doc_id % 11)
        assert r.height == 120 + 8 * (doc_id % 7)
        assert r.precision == 8
        assert r.n_components == (1 if doc_id % 5 == 0 else 3)
        assert r.progressive == (doc_id % 3 == 0)
        assert r.density_units == doc_id % 3
        assert r.x_density == 72 + 24 * (doc_id % 4)
        assert r.y_density == 72 + 24 * (doc_id % 5)

    # handcrafted: APP1 (Exif-shaped) segment the parser must skip
    app0 = b"JFIF\x00\x01\x02" + struct.pack(">BHH", 1, 300, 200) + b"\x00\x00"
    sof = struct.pack(">BHHB", 8, 33, 47, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    raw = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00ab"
        + b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )
    hand = spark.createDataFrame([(1, bytearray(raw))], "doc_id long, jpeg binary")
    r = parse_jpeg_meta(hand).collect()[0]
    assert (r.ok, r.width, r.height, r.n_components, r.progressive) == (
        True, 47, 33, 3, True,
    )
    assert (r.density_units, r.x_density, r.y_density) == (1, 300, 200)


def test_ivf_ncells_tuning_curve(spark):
    """The N_CELLS tuning curve's contracts: (1) invariants — one row
    per sweep point, scan fraction strictly positive and non-increasing
    in n_cells (more cells ⇒ smaller probed slice at fixed nprobe);
    (2) the per-index rank identity — recall at n_cells=8 must EQUAL
    the recall measured by intersecting an independently executed IVF
    search (topk_ivf_probe on the same cached quantizer at
    nprobe=_NCELLS_NPROBE) with the brute-force truth."""
    from stock_data_warehouse_analytics_spark.operators.similarity import (
        topk_bruteforce,
        topk_ivf_probe,
    )
    from stock_data_warehouse_analytics_spark.plans.llm_similarity import (
        _NCELLS_NPROBE,
        _NCELLS_SWEEP,
        _TUNE_K,
        _TUNE_NQ,
        _ncells_quantizer,
        sim_ivf_ncells_tuning,
    )
    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    rows = sim_ivf_ncells_tuning(spark, SF_SMALL).collect()
    assert [r.n_cells for r in rows] == sorted(_NCELLS_SWEEP)
    frac = [r.mean_frac_scanned for r in rows]
    assert all(0.0 < f <= 1.0 for f in frac)
    assert frac == sorted(frac, reverse=True), frac
    rec = [r[f"recall_at{_TUNE_K}"] for r in rows]
    assert all(0.0 <= r <= 1.0 for r in rec)

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < _TUNE_NQ)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, q, k=_TUNE_K).collect()
    }
    assigned, centers = _ncells_quantizer(spark, SF_SMALL, 8)
    got = {
        (r.query_id, r.neighbor_id)
        for r in topk_ivf_probe(
            assigned, centers, q, k=_TUNE_K, nprobe=_NCELLS_NPROBE
        ).collect()
    }
    want_recall = round(len(truth & got) / (_TUNE_K * _TUNE_NQ), 6)
    by_nc = {r.n_cells: r[f"recall_at{_TUNE_K}"] for r in rows}
    assert abs(by_nc[8] - want_recall) < 1e-9, (by_nc[8], want_recall)


def test_stream_jpeg_meta_gate_equals_batch(spark, tmp_path):
    """The stateless readStream multimodal metadata gate (header synth
    + marker-segment parse + row-local admission rule, no join, no
    state store) must produce EXACTLY the batch twin's row per
    arriving doc — same bytes, same parser, so equality is bit-exact;
    and every admission outcome (admitted + all four reject reasons)
    must be exercised."""
    from stock_data_warehouse_analytics_spark.plans import get_queries
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.admission import (
        streaming_jpeg_meta_gate,
    )

    d = load_table(spark, SF_SMALL, "documents")
    src = str(tmp_path / "docs")
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").coalesce(
        2
    ).write.mode("overwrite").json(src)
    q = streaming_jpeg_meta_gate(
        spark, src, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    def key(r):
        return (
            r.ok, r.width, r.height, r.n_components, r.progressive,
            r.admitted, r.reason,
        )

    got = {
        r.doc_id: key(r)
        for r in spark.table("stream_multimodal_meta_gate").collect()
    }
    want = {
        r.doc_id: key(r)
        for r in get_queries()["stream_multimodal_meta_gate"](
            spark, SF_SMALL
        ).collect()
    }
    assert want and got == want
    reasons = {v[-1] for v in want.values()}
    assert reasons >= {None, "corrupt", "grayscale", "progressive"}
    assert any(v[-2] for v in want.values())
