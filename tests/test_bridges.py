"""Bridge surfaces: pandas-on-Spark parity (the migration path for a
user of the pandas-based reference) and join-strategy hints (the
escape hatch when Catalyst's choice is wrong at scale)."""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_pandas_on_spark_rolling_matches_operator(spark):
    """pyspark.pandas — the drop-in pandas API the reference's user
    would reach for first — must agree with the native window operator:
    per-user rolling(5, min_periods=5) mean over the same series."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        from stock_data_warehouse_analytics_spark.operators.windows import (
            ordered_window,
            rolling_mean,
        )
        from stock_data_warehouse_analytics_spark.sources.tables import load_table

        events = load_table(spark, SF_SMALL, "events").select(
            "event_id", "user_id", "ts", "value"
        )
        w = ordered_window(["user_id"], ["ts", "event_id"])
        native = {
            r.event_id: r.rm
            for r in events.withColumn(
                "rm", rolling_mean("value", w, 5)
            ).collect()
        }

        pdf = (
            events.pandas_api()
            .sort_values(["user_id", "ts", "event_id"])
        )
        ps.set_option("compute.ops_on_diff_frames", True)
        rm = (
            pdf.groupby("user_id")["value"]
            .rolling(5, min_periods=5)
            .mean()
            .reset_index()
        )
        bridged = dict(
            zip(
                pdf["event_id"].to_numpy().tolist(),
                rm["value"].to_numpy().tolist(),
            )
        )
    assert len(native) == len(bridged)
    import math

    for eid, v in native.items():
        b = bridged[eid]
        if v is None:
            assert b is None or math.isnan(b), eid
        else:
            assert abs(v - b) < 1e-9, (eid, v, b)


def test_join_strategy_hints_are_honored(spark):
    """The three join-strategy hints must change the physical operator:
    BROADCAST → BroadcastHashJoin, SHUFFLE_HASH → ShuffledHashJoin,
    MERGE → SortMergeJoin — the per-query overrides for when statistics
    mislead the planner at 100 TB (a huge 'dim' accidentally broadcast,
    or a sort wasted on an already-bucketed pair)."""
    import contextlib
    import io

    from stock_data_warehouse_analytics_spark.sources.tables import load_table

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()

    o = load_table(spark, SF_SMALL, "orders")
    l = load_table(spark, SF_SMALL, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        # neutralize size-based auto-choice so the hint is the decider
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        cond = l["l_orderkey"] == o["o_orderkey"]
        assert "BroadcastHashJoin" in plan_of(l.join(o.hint("broadcast"), cond))
        assert "ShuffledHashJoin" in plan_of(l.join(o.hint("shuffle_hash"), cond))
        assert "SortMergeJoin" in plan_of(l.join(o.hint("merge"), cond))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
