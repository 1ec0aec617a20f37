"""Differential test: win_linear_interpolate's knot formula vs pandas
``interpolate(method='time', limit_area='inside')`` — the reference
semantics for time-weighted interpolation strictly between knots —
on randomized sparse series."""

from __future__ import annotations

import random

import pandas as pd


def _random_case(rng: random.Random):
    rows = []
    eid = 0
    for k in range(rng.randint(1, 3)):
        t = 0
        for _ in range(rng.randint(2, 30)):
            t += rng.randint(1, 5) * 1_000_000
            is_knot = rng.random() < 0.3
            rows.append(
                (
                    eid,
                    k,
                    t,
                    "purchase" if is_knot else "view",
                    round(rng.uniform(1, 100), 2),
                )
            )
            eid += 1
    return rows


def test_linear_interpolate_matches_pandas(spark, monkeypatch):
    import stock_data_warehouse_analytics_spark.plans.advanced2 as adv

    rng = random.Random(7)
    for _ in range(6):
        rows = _random_case(rng)
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, event_type string, value double"
        )
        monkeypatch.setattr(adv, "load_table", lambda _s, _d, _n: df)
        got = {
            r.event_id: r.interp_value
            for r in adv.win_linear_interpolate(spark, "ignored").collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
        ).sort_values(["user_id", "ts", "event_id"])
        for _, grp in pdf.groupby("user_id"):
            s = grp.apply(
                lambda r: r.value if r.event_type == "purchase" else None, axis=1
            )
            s.index = pd.to_datetime(grp.ts, unit="us")
            want = s.astype(float).interpolate(method="time", limit_area="inside")
            for eid, w in zip(grp.event_id, want):
                g = got[eid]
                if pd.isna(w):
                    assert g is None, (eid, g)
                else:
                    assert g is not None and abs(g - w) < 1e-9, (eid, g, w)
