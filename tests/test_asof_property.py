"""Differential testing of the as-of join family against
``pd.merge_asof`` — the reference implementation of the semantics
(backward/forward, tie inclusion, tolerance) — on randomized inputs.
Catches frame/ordering mistakes the single-dataset oracle query can't
(e.g. ties at equal timestamps, keys present on only one side, empty
build groups)."""

from __future__ import annotations

import random

import pandas as pd

from stock_data_warehouse_analytics_spark.plans.joins_advanced import asof_join

_US = 1_000_000


def _random_case(rng: random.Random):
    keys = list(range(rng.randint(1, 4)))
    probe = [
        (rng.choice(keys), rng.randint(0, 50) * _US)
        for _ in range(rng.randint(1, 25))
    ]
    # build unique per (key, ts) — the operator's documented precondition
    build_pairs = {
        (rng.choice(keys + [99]), rng.randint(0, 50) * _US)
        for _ in range(rng.randint(1, 15))
    }
    build = [(k, ts, float(i)) for i, (k, ts) in enumerate(sorted(build_pairs))]
    return probe, build


def _pandas_expected(probe, build, direction, tolerance_us):
    pdf = pd.DataFrame(probe, columns=["k", "ts"]).sort_values(["ts", "k"])
    bdf = pd.DataFrame(build, columns=["k", "ts", "v"]).sort_values(["ts", "k"])
    kwargs = {}
    if tolerance_us is not None:
        kwargs["tolerance"] = tolerance_us
    out = pd.merge_asof(
        pdf, bdf, on="ts", by="k", direction=direction, **kwargs
    )
    return sorted(
        (int(r.k), int(r.ts), None if pd.isna(r.v) else float(r.v))
        for r in out.itertuples()
    )


def _spark_actual(spark, probe, build, direction, tolerance_us):
    p = spark.createDataFrame(probe, "k int, ts long")
    b = spark.createDataFrame(build, "k int, ts long, v double")
    out = asof_join(
        p,
        b,
        on="k",
        value_col="v",
        direction=direction,
        tolerance_us=tolerance_us,
    ).collect()
    return sorted((r.k, r.ts, r.v) for r in out)


def test_asof_join_differential_vs_pandas(spark):
    rng = random.Random(20260813)
    for case in range(12):
        probe, build = _random_case(rng)
        for direction in ("backward", "forward", "nearest"):
            for tolerance_us in (None, 0, 5 * _US):
                got = _spark_actual(spark, probe, build, direction, tolerance_us)
                want = _pandas_expected(probe, build, direction, tolerance_us)
                assert got == want, (
                    f"case={case} dir={direction} tol={tolerance_us}\n"
                    f"probe={probe}\nbuild={build}\ngot={got}\nwant={want}"
                )
