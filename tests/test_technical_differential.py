"""Differential testing of the technical-indicator windows against
pandas — the reference implementation of rolling semantics
(min_periods masking, sample std, SMA-based RSI) — on randomized
multi-key series.  Catches frame off-by-ones the single-dataset oracle
can't (both engines could share the same wrong frame)."""

from __future__ import annotations

import math
import random

import pandas as pd

_ALPHA, _L = 0.25, 10


def _random_series(rng: random.Random):
    rows = []
    eid = 0
    for k in range(rng.randint(1, 3)):
        for _ in range(rng.randint(1, 40)):
            rows.append((eid, k, eid * 1_000_000, round(rng.uniform(1, 100), 2)))
            eid += 1
    rng.shuffle(rows)
    return rows


def _spark_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )


def _run_query(fn, spark, rows, tmp_path, monkeypatch):
    """Run a registered query function against an in-memory events table
    by monkeypatching the loader."""
    import stock_data_warehouse_analytics_spark.plans.technical as tech

    df = _spark_df(spark, rows)
    monkeypatch.setattr(tech, "load_table", lambda _s, _d, _n: df)
    return fn(spark, "ignored")


def test_bollinger_matches_pandas(spark, tmp_path, monkeypatch):
    from stock_data_warehouse_analytics_spark.plans.technical import (
        win_bollinger_bands,
    )

    rng = random.Random(1)
    for _ in range(5):
        rows = _random_series(rng)
        got = {
            r.event_id: (r.mid, r.upper_band, r.lower_band)
            for r in _run_query(
                win_bollinger_bands, spark, rows, tmp_path, monkeypatch
            ).collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).sort_values(["user_id", "ts", "event_id"])
        g = pdf.groupby("user_id")["value"]
        mid = g.transform(lambda s: s.rolling(20).mean())
        sd = g.transform(lambda s: s.rolling(20).std())
        for eid, m, s in zip(pdf.event_id, mid, sd):
            gm, gu, gl = got[eid]
            if math.isnan(m):
                assert gm is None and gu is None and gl is None, eid
            else:
                assert abs(gm - m) < 1e-9, eid
                assert abs(gu - (m + 2 * s)) < 1e-9, eid
                assert abs(gl - (m - 2 * s)) < 1e-9, eid


def test_rsi_matches_pandas(spark, tmp_path, monkeypatch):
    from stock_data_warehouse_analytics_spark.plans.technical import win_rsi_cutler

    rng = random.Random(2)
    for _ in range(5):
        rows = _random_series(rng)
        got = {
            r.event_id: r.rsi14
            for r in _run_query(
                win_rsi_cutler, spark, rows, tmp_path, monkeypatch
            ).collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).sort_values(["user_id", "ts", "event_id"])

        def rsi(s: pd.Series) -> pd.Series:
            d = s.diff()
            gain = d.clip(lower=0).rolling(14).sum()
            loss = (-d).clip(lower=0).rolling(14).sum()
            out = 100 * gain / (gain + loss)
            return out.where((gain + loss) != 0)

        want = pdf.groupby("user_id")["value"].transform(rsi)
        for eid, w in zip(pdf.event_id, want):
            g = got[eid]
            if pd.isna(w):
                assert g is None, eid
            else:
                assert abs(g - w) < 1e-9, (eid, g, w)


def test_ewma_matches_truncated_weights(spark, tmp_path, monkeypatch):
    """The bounded-lookback EWMA equals the explicit L-term weighted
    mean (the operator's contract — NOT pandas' infinite-history ewm,
    from which it differs by the documented truncation tail)."""
    from stock_data_warehouse_analytics_spark.plans.technical import win_ewma

    rng = random.Random(3)
    weights = [(1 - _ALPHA) ** j for j in range(_L)]
    norm = sum(weights)
    for _ in range(5):
        rows = _random_series(rng)
        got = {
            r.event_id: r.ewma
            for r in _run_query(
                win_ewma, spark, rows, tmp_path, monkeypatch
            ).collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).sort_values(["user_id", "ts", "event_id"])
        for _, grp in pdf.groupby("user_id"):
            vals = list(grp.value)
            eids = list(grp.event_id)
            for i, eid in enumerate(eids):
                if i < _L - 1:
                    assert got[eid] is None, eid
                else:
                    want = (
                        sum(w * vals[i - j] for j, w in enumerate(weights)) / norm
                    )
                    assert abs(got[eid] - want) < 1e-9, eid


def test_wilder_rsi_matches_explicit_recurrence(spark, tmp_path, monkeypatch):
    """win_rsi_wilder vs an explicit Python recurrence loop (NOT the
    same pandas ewm call the operator uses — an independent
    implementation of adjust=False Wilder smoothing), plus the row
    contract: null until 14 diffs, 100 on pure-gain series, null on
    flat series."""
    from stock_data_warehouse_analytics_spark.plans.technical import win_rsi_wilder

    rng = random.Random(7)
    for _ in range(5):
        rows = _random_series(rng)
        got = {
            r.event_id: r.rsi
            for r in _run_query(
                win_rsi_wilder, spark, rows, tmp_path, monkeypatch
            ).collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).sort_values(["user_id", "ts", "event_id"])

        def wilder_avg(xs):
            # explicit adjust=False recurrence, NaN-skipping seed
            alpha = 1.0 / 14
            out, avg, n_seen = [], None, 0
            for x in xs:
                if math.isnan(x):
                    out.append(float("nan"))
                    continue
                n_seen += 1
                avg = x if avg is None else (1 - alpha) * avg + alpha * x
                out.append(avg if n_seen >= 14 else float("nan"))
            return out

        for _uid, g in pdf.groupby("user_id"):
            d = g["value"].diff().tolist()
            ag = wilder_avg([max(x, 0.0) if not math.isnan(x) else x for x in d])
            al = wilder_avg([max(-x, 0.0) if not math.isnan(x) else x for x in d])
            for eid, a_g, a_l in zip(g.event_id, ag, al):
                out = got[eid]
                if math.isnan(a_g) or (a_g + a_l) == 0:
                    assert out is None, (eid, out)
                else:
                    want = 100.0 * a_g / (a_g + a_l)
                    assert abs(out - want) < 1e-9, (eid, out, want)

    # contract rows: monotone-increasing series → RSI exactly 100;
    # flat series → null
    mono = [(i, 0, i * 1000, float(i)) for i in range(20)]
    flat = [(100 + i, 1, i * 1000, 5.0) for i in range(20)]
    got = {
        r.event_id: r.rsi
        for r in _run_query(
            win_rsi_wilder, spark, mono + flat, tmp_path, monkeypatch
        ).collect()
    }
    assert got[19] == 100.0
    assert all(got[i] is None for i in range(14))  # <14 diffs
    assert all(got[100 + i] is None for i in range(20))  # flat


def test_holt_linear_matches_explicit_recurrence(spark, tmp_path, monkeypatch):
    """win_holt_linear_forecast vs an independent recurrence replay:
    level/trend/forecast per row, null before the 2-point init."""
    from stock_data_warehouse_analytics_spark.plans.technical import (
        win_holt_linear_forecast,
    )

    rng = random.Random(11)
    for _ in range(4):
        rows = _random_series(rng)
        got = {
            r.event_id: (r.level, r.trend, r.forecast)
            for r in _run_query(
                win_holt_linear_forecast, spark, rows, tmp_path, monkeypatch
            ).collect()
        }
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).sort_values(["user_id", "ts", "event_id"])
        a, b = 0.3, 0.1
        for _uid, g in pdf.groupby("user_id"):
            xs = g["value"].tolist()
            eids = g["event_id"].tolist()
            want = [None, None]
            if len(xs) >= 2:
                l_, b_ = xs[1], xs[1] - xs[0]
                want = [None, (l_, b_)]
                for x in xs[2:]:
                    prev = l_
                    l_ = a * x + (1 - a) * (l_ + b_)
                    b_ = b * (l_ - prev) + (1 - b) * b_
                    want.append((l_, b_))
            for eid, w in zip(eids, want):
                gl, gt, gf = got[eid]
                if w is None:
                    assert gl is None and gt is None and gf is None, eid
                else:
                    wl, wt = w
                    assert abs(gl - wl) < 1e-9, (eid, gl, wl)
                    assert abs(gt - wt) < 1e-9, (eid, gt, wt)
                    assert abs(gf - (wl + wt)) < 1e-9, eid


def test_holt_winters_matches_explicit_recurrence(spark, monkeypatch):
    """win_holt_winters_forecast vs an independent replay of the
    additive Holt–Winters recurrence (classic two-week init) on the
    daily count series the query derives — independent code path from
    the applyInPandas kernel."""
    import datetime

    import stock_data_warehouse_analytics_spark.plans.forecast_eval as fe
    from stock_data_warehouse_analytics_spark.plans.forecast_eval import (
        win_holt_winters_forecast,
    )

    rng = random.Random(7)
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    counts = {}  # (etype, day) -> n
    for etype in ("aa", "bb"):
        for day in range(21):  # 3 full weeks
            n = rng.randint(1, 9)
            counts[(etype, day)] = n
            for _ in range(n):
                rows.append(
                    (
                        eid,
                        base + datetime.timedelta(days=day, seconds=eid % 7),
                        1,
                        etype,
                        1.0,
                        "{}",
                    )
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(fe, "load_table", lambda _s, _d, _n: df)
    got = {
        (r.event_type, r.h): (r.forecast, r.level, r.trend)
        for r in win_holt_winters_forecast(spark, "ignored").collect()
    }

    m, a, b, g = 7, 0.3, 0.1, 0.2
    for etype in ("aa", "bb"):
        y = [float(counts[(etype, d)]) for d in range(21)]
        lvl = sum(y[:m]) / m
        trd = (sum(y[m : 2 * m]) / m - sum(y[:m]) / m) / m
        season = [y[i] - lvl for i in range(m)]
        for t in range(m, len(y)):
            s_prev = season[t % m]
            l_prev = lvl
            lvl = a * (y[t] - s_prev) + (1 - a) * (lvl + trd)
            trd = b * (lvl - l_prev) + (1 - b) * trd
            season[t % m] = g * (y[t] - lvl) + (1 - g) * s_prev
        n = len(y)
        for h in range(1, 8):
            want = lvl + h * trd + season[(n + h - 1) % m]
            f, lv, tr = got[(etype, h)]
            assert abs(f - want) < 1e-9, (etype, h, f, want)
            assert abs(lv - lvl) < 1e-9 and abs(tr - trd) < 1e-9

    # too-short series (< 2 periods) must emit no rows, not crash
    short = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=i), 1, "cc", 1.0, "{}")
            for i in range(10)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(fe, "load_table", lambda _s, _d, _n: short)
    assert win_holt_winters_forecast(spark, "ignored").count() == 0
