"""Incremental rollup: chunked upserts must equal a full batch
recompute, only affected partitions rewritten, and the streaming
foreachBatch path must land the same table."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def _as_dict(df):
    return {
        (r.day, r.event_type): (r.n, round(r.total_value, 6), r.min_value, r.max_value)
        for r in df.collect()
    }


def test_chunked_upserts_equal_batch(spark, tmp_path):
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.incremental import (
        daily_rollup,
        upsert_daily_rollup,
    )

    events = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "rollup")

    # three arbitrary chunks (split by event_id ranges, days overlap)
    chunks = [
        events.filter(F.col("event_id") % 3 == i) for i in range(3)
    ]
    for c in chunks:
        upsert_daily_rollup(spark, c, path)

    got = _as_dict(spark.read.parquet(path))
    want = _as_dict(daily_rollup(events))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-9), k
        assert got[k][2] == want[k][2] and got[k][3] == want[k][3], k


def test_upsert_touches_only_affected_partitions(spark, tmp_path):
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.incremental import (
        upsert_daily_rollup,
    )

    events = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "rollup")
    upsert_daily_rollup(spark, events, path)

    # snapshot mtimes of every day partition
    def mtimes():
        return {
            d: os.path.getmtime(os.path.join(path, d))
            for d in os.listdir(path)
            if d.startswith("day=")
        }

    before = mtimes()
    one_day = events.filter(F.col("ts").cast("date") == F.lit("2024-01-15"))
    assert one_day.count() > 0
    upsert_daily_rollup(spark, one_day, path)
    after = mtimes()

    changed = {d for d in before if after[d] != before[d]}
    assert changed == {"day=2024-01-15"}, changed


def test_streaming_foreachbatch_rollup(spark, tmp_path):
    from stock_data_warehouse_analytics_spark.sources.tables import load_table
    from stock_data_warehouse_analytics_spark.streaming.incremental import (
        daily_rollup,
        stream_into_rollup,
    )

    events = load_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(3).write.mode("overwrite").json(src)

    q = stream_into_rollup(
        spark,
        src,
        str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = _as_dict(spark.read.parquet(str(tmp_path / "rollup")))
    want = _as_dict(daily_rollup(events))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-9), k
