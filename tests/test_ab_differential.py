"""Independent numpy/pandas differentials for the round-5 statistics
(A/B family, Kendall τ-b, Pareto skyline, BM25).

The DuckDB oracle mirrors share each query's FORMULA, so a formula
error would pass the oracle gate on both engines.  These tests
recompute every statistic from the raw parquet with an unrelated
implementation (pandas groupby + numpy moments, an O(n²) τ loop, a
brute-force dominance scan, a dict-based BM25) and compare.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def _user_metric(ev: pd.DataFrame) -> pd.DataFrame:
    ev = ev.copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    purch = ev[ev["event_type"] == "purchase"]
    y = purch.groupby("user_id")["cents"].sum()
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["y"] = users["user_id"].map(y).fillna(0).astype("int64")
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    return users


def test_welch_ttest_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing import (
        eval_ab_welch_ttest,
    )

    row = eval_ab_welch_ttest(spark, SF_SMALL).collect()[0]
    users = _user_metric(_events())
    c = users.loc[users["variant"] == 0, "y"].to_numpy(dtype=float)
    t = users.loc[users["variant"] == 1, "y"].to_numpy(dtype=float)
    vc, vt = c.var(ddof=1), t.var(ddof=1)
    se2 = vt / len(t) + vc / len(c)
    t_ref = (t.mean() - c.mean()) / math.sqrt(se2)
    df_ref = se2 * se2 / (
        (vt / len(t)) ** 2 / (len(t) - 1)
        + (vc / len(c)) ** 2 / (len(c) - 1)
    )
    assert row["n_control"] == len(c) and row["n_treatment"] == len(t)
    assert row["mean_control"] == pytest.approx(c.mean() / 100, abs=1e-5)
    assert row["t_stat"] == pytest.approx(t_ref, abs=1e-5)
    assert row["welch_df"] == pytest.approx(df_ref, abs=1e-3)
    assert row["significant"] == (abs(t_ref) > 1.959964)


def test_srm_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing import (
        eval_ab_srm_check,
    )

    row = eval_ab_srm_check(spark, SF_SMALL).collect()[0]
    users = _user_metric(_events())
    n_c = int((users["variant"] == 0).sum())
    n_t = int((users["variant"] == 1).sum())
    exp = (n_c + n_t) / 2
    chi2 = ((n_c - exp) ** 2 + (n_t - exp) ** 2) / exp
    assert (row["n_control"], row["n_treatment"]) == (n_c, n_t)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["srm_detected"] == (chi2 > 3.841459)


def _prepost() -> pd.DataFrame:
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize()
    mind, maxd = ev["d"].min(), ev["d"].max()
    cutoff = mind + pd.Timedelta(days=(maxd - mind).days // 2)
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    purch = ev[ev["event_type"] == "purchase"]
    x = purch[purch["d"] < cutoff].groupby("user_id")["cents"].sum()
    y = purch[purch["d"] >= cutoff].groupby("user_id")["cents"].sum()
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["x"] = users["user_id"].map(x).fillna(0).astype("int64")
    users["y"] = users["user_id"].map(y).fillna(0).astype("int64")
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    return users


def test_cuped_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing import (
        eval_ab_cuped_adjust,
    )

    rows = {
        r["variant"]: r
        for r in eval_ab_cuped_adjust(spark, SF_SMALL).collect()
    }
    users = _prepost()
    x = users["x"].to_numpy(dtype=float)
    y = users["y"].to_numpy(dtype=float)
    cov = np.mean(x * y) - x.mean() * y.mean()
    theta = cov / (np.mean(x * x) - x.mean() ** 2)
    rho_sq = cov * cov / (
        (np.mean(x * x) - x.mean() ** 2)
        * (np.mean(y * y) - y.mean() ** 2)
    )
    for v in (0, 1):
        sub = users[users["variant"] == v]
        adj = (
            sub["y"].mean() - theta * (sub["x"].mean() - x.mean())
        ) / 100
        assert rows[v]["n_users"] == len(sub)
        assert rows[v]["adj_mean_y"] == pytest.approx(adj, abs=1e-5)
        assert rows[v]["theta"] == pytest.approx(theta, abs=1e-5)
        assert rows[v]["var_reduction"] == pytest.approx(rho_sq, abs=1e-5)


def test_diff_in_diff_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing import (
        eval_ab_diff_in_diff,
    )

    row = eval_ab_diff_in_diff(spark, SF_SMALL).collect()[0]
    users = _prepost()
    m = {
        (v, col): users.loc[users["variant"] == v, col].mean() / 100
        for v in (0, 1)
        for col in ("x", "y")
    }
    did = (m[(1, "y")] - m[(1, "x")]) - (m[(0, "y")] - m[(0, "x")])
    assert row["pre_gap"] == pytest.approx(
        m[(1, "x")] - m[(0, "x")], abs=1e-5
    )
    assert row["did_estimate"] == pytest.approx(did, abs=1e-5)


def test_power_mde_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing import (
        eval_ab_power_mde,
    )

    row = eval_ab_power_mde(spark, SF_SMALL).collect()[0]
    users = _user_metric(_events())
    c = users.loc[users["variant"] == 0, "y"].to_numpy(dtype=float)
    t = users.loc[users["variant"] == 1, "y"].to_numpy(dtype=float)
    se = math.sqrt(c.var(ddof=1) / len(c) + t.var(ddof=1) / len(t))
    assert row["se"] == pytest.approx(se / 100, abs=1e-5)
    assert row["mde_abs"] == pytest.approx(2.801585 * se / 100, abs=1e-5)
    assert row["mde_rel"] == pytest.approx(
        2.801585 * se / c.mean(), abs=1e-5
    )


def test_kendall_tau_matches_quadratic_loop(spark):
    from stock_data_warehouse_analytics_spark.plans.olap_depth import (
        win_kendall_tau_daily,
    )

    row = win_kendall_tau_daily(spark, SF_SMALL).collect()[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    daily = o.groupby("o_orderdate").agg(
        x=("o_orderkey", "size"), y=("cents", "sum")
    )
    xs, ys = daily["x"].to_numpy(), daily["y"].to_numpy()
    conc = disc = tx = ty = 0
    n = len(xs)
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx and dy:
                if (dx > 0) == (dy > 0):
                    conc += 1
                else:
                    disc += 1
            elif dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
    tau = (conc - disc) / math.sqrt(
        (conc + disc + tx) * (conc + disc + ty)
    )
    assert row["n_days"] == n
    assert (row["concordant"], row["discordant"]) == (conc, disc)
    assert (row["ties_x"], row["ties_y"]) == (tx, ty)
    assert row["tau_b"] == pytest.approx(tau, abs=1e-5)


def test_skyline_matches_bruteforce(spark):
    from stock_data_warehouse_analytics_spark.plans.olap_depth import (
        olap_skyline_per_brand,
    )

    got = {
        (r["p_brand"], int(round(r["price"] * 100)), r["size"])
        for r in olap_skyline_per_brand(spark, SF_SMALL).collect()
    }
    p = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    p["cents"] = (p["p_retailprice"] * 100).round().astype("int64")
    want = set()
    for brand, grp in p.groupby("p_brand"):
        pts = list(zip(grp["cents"], grp["p_size"]))
        for c, s in set(pts):
            dominated = any(
                (c2 >= c and s2 >= s) and (c2 > c or s2 > s)
                for c2, s2 in pts
            )
            if not dominated:
                want.add((brand, c, s))
    assert got == want


def test_bm25_matches_dict_implementation(spark):
    from stock_data_warehouse_analytics_spark.plans.retrieval import (
        _QUERY_TERMS,
        text_bm25_topk,
    )

    got = [
        (r["doc_id"], r["bm25"])
        for r in text_bm25_topk(spark, SF_SMALL).collect()
    ]
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    toks = {
        r.doc_id: str(r.text).strip().lower().split()
        for r in docs.itertuples()
    }
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in _QUERY_TERMS
    }
    scores = {}
    for doc_id, t in toks.items():
        s = 0
        for q in _QUERY_TERMS:
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            s += round(
                idf
                * (tf * 2.2)
                / (tf + 1.2 * (0.25 + 0.75 * (len(t) / avgdl)))
                * 1e9
            )
        if s:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, got_s), (_, want_n) in zip(got, want):
        assert got_s == pytest.approx(want_n / 1e9, abs=1e-5)


def test_proportion_ztest_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_proportion_ztest,
    )

    row = eval_ab_proportion_ztest(spark, SF_SMALL).collect()[0]
    ev = _events()
    conv = ev[ev["event_type"] == "purchase"]["user_id"].unique()
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["converted"] = users["user_id"].isin(conv).astype(int)
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    n_c = int((users["variant"] == 0).sum())
    n_t = int((users["variant"] == 1).sum())
    k_c = int(users.loc[users["variant"] == 0, "converted"].sum())
    k_t = int(users.loc[users["variant"] == 1, "converted"].sum())
    pp = (k_c + k_t) / (n_c + n_t)
    assert (row["conv_control"], row["conv_treatment"]) == (k_c, k_t)
    if pp in (0.0, 1.0):
        # degenerate split (everyone/no-one converted): the pooled
        # variance is 0 and z is 0/0 = NaN on both engines
        assert row["z_stat"] is None or math.isnan(row["z_stat"])
    else:
        z = (k_t / n_t - k_c / n_c) / math.sqrt(
            pp * (1 - pp) * (1 / n_c + 1 / n_t)
        )
        assert row["z_stat"] == pytest.approx(z, abs=1e-5)
        assert row["significant"] == (abs(z) > 1.959964)


def test_readout_panel_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_readout_panel,
    )

    row = eval_ab_readout_panel(spark, SF_SMALL).collect()[0]
    users = _prepost()
    c = users[users["variant"] == 0]
    t = users[users["variant"] == 1]
    n_c, n_t = len(c), len(t)
    exp = (n_c + n_t) / 2
    chi2 = ((n_c - exp) ** 2 + (n_t - exp) ** 2) / exp
    yc = c["y"].to_numpy(dtype=float)
    yt = t["y"].to_numpy(dtype=float)
    t_ref = (yt.mean() - yc.mean()) / math.sqrt(
        yt.var(ddof=1) / n_t + yc.var(ddof=1) / n_c
    )
    x = users["x"].to_numpy(dtype=float)
    y = users["y"].to_numpy(dtype=float)
    theta = (np.mean(x * y) - x.mean() * y.mean()) / (
        np.mean(x * x) - x.mean() ** 2
    )
    lift = (yt.mean() - yc.mean()) / 100
    adj_lift = (
        (yt.mean() - yc.mean())
        - theta * (t["x"].mean() - c["x"].mean())
    ) / 100
    did = (
        (yt.mean() - t["x"].mean()) - (yc.mean() - c["x"].mean())
    ) / 100
    assert row["srm_chi2"] == pytest.approx(chi2, abs=1e-5)
    assert row["t_stat"] == pytest.approx(t_ref, abs=1e-5)
    assert row["lift_abs"] == pytest.approx(lift, abs=1e-5)
    assert row["cuped_adj_lift"] == pytest.approx(adj_lift, abs=1e-5)
    assert row["did_estimate"] == pytest.approx(did, abs=1e-5)
    ship = (
        chi2 <= 3.841459 and abs(t_ref) > 1.959964 and adj_lift > 0
    )
    assert row["ship"] == ship


def test_forecast_backtest_matches_pandas(spark):
    from stock_data_warehouse_analytics_spark.plans.forecast_eval import (
        eval_forecast_backtest,
    )

    got = {
        r["event_type"]: r
        for r in eval_forecast_backtest(spark, SF_SMALL).collect()
    }
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize()
    daily = (
        ev.groupby(["event_type", "d"]).size().rename("y").reset_index()
    )
    for et, grp in daily.groupby("event_type"):
        g = grp.sort_values("d")
        y = g["y"].to_numpy(dtype=float)
        e_s = y[7:] - y[:-7]
        e_n = y[7:] - y[6:-1]
        mae_s, mae_n = np.abs(e_s).mean(), np.abs(e_n).mean()
        r = got[et]
        assert r["n_eval_days"] == len(e_s)
        assert r["mae_seasonal7"] == pytest.approx(mae_s, abs=1e-5)
        assert r["mae_naive1"] == pytest.approx(mae_n, abs=1e-5)
        assert r["mase"] == pytest.approx(mae_s / mae_n, abs=1e-5)
        assert r["beats_naive"] == (mae_s / mae_n < 1.0)


def test_metric_panel_matches_numpy(spark):
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_metric_panel,
    )

    got = {
        r["event_type"]: r
        for r in eval_ab_metric_panel(spark, SF_SMALL).collect()
    }
    ev = _events()
    all_users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    all_users["variant"] = all_users["user_id"].map(
        lambda u: _h60(str(u)) % 2
    )
    for et in ev["event_type"].unique():
        k = (
            ev[ev["event_type"] == et]
            .groupby("user_id")
            .size()
        )
        u = all_users.copy()
        u["k"] = u["user_id"].map(k).fillna(0)
        c = u.loc[u["variant"] == 0, "k"].to_numpy(dtype=float)
        t = u.loc[u["variant"] == 1, "k"].to_numpy(dtype=float)
        t_ref = (t.mean() - c.mean()) / math.sqrt(
            t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        )
        # independent threshold derivation: inverse normal at α/(2m)
        # for the DATA-derived metric count m
        from statistics import NormalDist

        m_count = ev["event_type"].nunique()
        crit = round(NormalDist().inv_cdf(1 - 0.025 / m_count), 6)
        r = got[et]
        assert (r["n_control"], r["n_treatment"]) == (len(c), len(t))
        assert r["n_metrics"] == m_count
        assert r["mean_control"] == pytest.approx(c.mean(), abs=1e-5)
        assert r["t_stat"] == pytest.approx(t_ref, abs=1e-5)
        assert r["sig_raw"] == (abs(t_ref) > 1.959964)
        assert r["sig_bonferroni"] == (abs(t_ref) > crit)


def test_deletion_cascade_matches_pandas(spark):
    from stock_data_warehouse_analytics_spark.plans.compliance import (
        dq_deletion_cascade,
    )

    row = dq_deletion_cascade(spark, SF_SMALL).collect()[0]
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    flagged = set(
        k for k in cust["c_custkey"] if _h60(str(k)) % 20 == 0
    )
    ord_del = orders["o_custkey"].isin(flagged)
    del_keys = set(orders.loc[ord_del, "o_orderkey"])
    li_del = li["l_orderkey"].isin(del_keys)
    cents = (li["l_extendedprice"] * 100).round().astype("int64")
    assert row["n_customers"] == len(cust)
    assert row["n_customers_flagged"] == len(flagged)
    assert row["n_orders_cascade"] == int(ord_del.sum())
    assert row["n_orders_kept"] == int((~ord_del).sum())
    assert row["n_lineitems_cascade"] == int(li_del.sum())
    assert row["n_lineitems_kept"] == int((~li_del).sum())
    assert row["revenue_removed"] == pytest.approx(
        cents[li_del].sum() / 100, abs=1e-2
    )


def test_cumulative_tstat_matches_bruteforce(spark):
    """The incremental second-moment trajectory must equal a per-day
    brute-force recomputation over the fixed user universe."""
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_cumulative_tstat,
    )

    got = {
        r["d"]: (r["t_stat"], r["mean_control"], r["mean_treatment"])
        for r in eval_ab_cumulative_tstat(spark, SF_SMALL).collect()
    }
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize().dt.date
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    purch = ev[ev["event_type"] == "purchase"]
    for day in sorted(got):
        upto = purch[purch["d"] <= day]
        y = users["user_id"].map(
            upto.groupby("user_id")["cents"].sum()
        ).fillna(0)
        c = y[users["variant"] == 0].to_numpy(dtype=float)
        t = y[users["variant"] == 1].to_numpy(dtype=float)
        t_ref = (t.mean() - c.mean()) / math.sqrt(
            t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        )
        assert got[day][0] == pytest.approx(t_ref, abs=1e-5), day
        assert got[day][1] == pytest.approx(c.mean() / 100, abs=1e-5)
        assert got[day][2] == pytest.approx(t.mean() / 100, abs=1e-5)


def test_msprt_matches_bruteforce(spark):
    """The always-valid mSPRT trajectory must equal a per-day brute
    force: Λ_D from scratch moments at every snapshot, p_D as the
    running min of 1/Λ — monotone non-increasing by construction."""
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        _MSPRT_ALPHA,
        _MSPRT_TAU2,
        eval_ab_msprt,
    )

    rows = eval_ab_msprt(spark, SF_SMALL).collect()
    got = {r["d"]: r for r in rows}
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize().dt.date
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    purch = ev[ev["event_type"] == "purchase"]
    p_run = 1.0
    prev_p = 1.0
    for day in sorted(got):
        upto = purch[purch["d"] <= day]
        y = (
            users["user_id"]
            .map(upto.groupby("user_id")["cents"].sum())
            .fillna(0)
        )
        c = y[users["variant"] == 0].to_numpy(dtype=float) / 100
        t = y[users["variant"] == 1].to_numpy(dtype=float) / 100
        theta = t.mean() - c.mean()
        vv = t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        if vv <= 0:
            lnl = 0.0
        else:
            lnl = 0.5 * math.log(vv / (vv + _MSPRT_TAU2)) + (
                theta * theta
            ) * _MSPRT_TAU2 / (2 * vv * (vv + _MSPRT_TAU2))
        p_run = min(p_run, min(1.0, math.exp(-lnl)))
        r = got[day]
        assert r["theta_hat"] == pytest.approx(theta, abs=1e-5), day
        assert r["ln_lambda"] == pytest.approx(lnl, abs=1e-4), day
        assert r["p_always_valid"] == pytest.approx(p_run, abs=1e-4), day
        assert r["rejected"] == (r["p_always_valid"] <= _MSPRT_ALPHA)
        # always-valid p must be monotone non-increasing
        assert r["p_always_valid"] <= prev_p + 1e-12
        prev_p = r["p_always_valid"]


def test_obf_spending_matches_scipy_free_normal(spark):
    """The OBF-shaped trajectory must match an independent
    recomputation: per-day brute-force Welch t, calendar-fraction
    boundary z/sqrt(k/K), and alpha_spent within the A&S polynomial's
    published error bound of the EXACT normal tail
    (statistics.NormalDist — an implementation unrelated to the
    polynomial both engines evaluate)."""
    from statistics import NormalDist

    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        _OBF_Z,
        eval_ab_obf_spending,
    )

    rows = eval_ab_obf_spending(spark, SF_SMALL).collect()
    got = {r["d"]: r for r in rows}
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize().dt.date
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    purch = ev[ev["event_type"] == "purchase"]
    days = sorted(got)
    kk = len(days)
    nd = NormalDist()
    crossed = False
    for k, day in enumerate(days, start=1):
        upto = purch[purch["d"] <= day]
        y = (
            users["user_id"]
            .map(upto.groupby("user_id")["cents"].sum())
            .fillna(0)
        )
        c = y[users["variant"] == 0].to_numpy(dtype=float)
        t = y[users["variant"] == 1].to_numpy(dtype=float)
        t_ref = (t.mean() - c.mean()) / math.sqrt(
            t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        )
        bound_ref = _OBF_Z / math.sqrt(k / kk)
        alpha_ref = 2.0 * (1.0 - nd.cdf(bound_ref))
        r = got[day]
        assert r["look_idx"] == k and r["n_looks"] == kk
        assert r["t_stat"] == pytest.approx(t_ref, abs=1e-5), day
        assert r["info_frac"] == pytest.approx(k / kk, abs=1e-6)
        assert r["obf_bound"] == pytest.approx(bound_ref, abs=1e-5), day
        # A&S 26.2.17 |err| < 7.5e-8 on Phi; 2x on the two-sided value
        assert r["alpha_spent"] == pytest.approx(alpha_ref, abs=2e-7), day
        assert r["stop_obf"] == (abs(r["t_stat"]) >= r["obf_bound"])
        crossed = crossed or r["stop_obf"]
        assert r["stopped_by_now"] == crossed
        # the boundary must RELAX monotonically to the fixed-horizon z
        assert r["obf_bound"] >= _OBF_Z - 1e-9
    assert rows[-1]["obf_bound"] == pytest.approx(_OBF_Z, abs=1e-6)


def test_fdr_bh_matches_pure_python(spark):
    """The BH step-up decision must match an independent replay:
    per-metric Welch t from pandas moments, exact normal p-values
    (statistics.NormalDist — not the A&S polynomial the engines run),
    and the textbook max{i: p_(i) <= i*q/m} rule."""
    from statistics import NormalDist

    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_fdr_bh,
    )

    rows = eval_ab_fdr_bh(spark, SF_SMALL).collect()
    got = {r["event_type"]: r for r in rows}
    ev = _events().copy()
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    nd = NormalDist()
    pvals = {}
    for et in sorted(ev["event_type"].unique()):
        k = (
            users["user_id"]
            .map(ev[ev["event_type"] == et].groupby("user_id").size())
            .fillna(0)
        )
        c = k[users["variant"] == 0].to_numpy(dtype=float)
        t = k[users["variant"] == 1].to_numpy(dtype=float)
        t_ref = (t.mean() - c.mean()) / math.sqrt(
            t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        )
        p_ref = 2.0 * (1.0 - nd.cdf(abs(t_ref)))
        pvals[et] = p_ref
        r = got[et]
        assert r["t_stat"] == pytest.approx(t_ref, abs=1e-5), et
        # A&S polynomial |err| < 7.5e-8 per tail (2x two-sided) plus
        # the 6-dp t quantization through the pdf slope (<= 2*0.4*5e-7)
        assert r["p_value"] == pytest.approx(p_ref, abs=1e-6), et
    m = len(pvals)
    order = sorted(pvals, key=lambda e: (pvals[e], e))
    k_max = 0
    for i, et in enumerate(order, start=1):
        if pvals[et] <= i * 0.05 / m:
            k_max = i
    for i, et in enumerate(order, start=1):
        r = got[et]
        assert r["bh_rank"] == i and r["n_metrics"] == m
        assert r["bh_threshold"] == pytest.approx(i * 0.05 / m, abs=1e-9)
        assert r["sig_bh"] == (i <= k_max), et
        assert r["sig_raw"] == (r["p_value"] <= 0.05)


def test_futility_power_matches_bruteforce(spark):
    """Conditional power under the current trend must equal the
    per-day brute force: scratch Welch t, B-value, the Lan-Wittes
    extrapolation with the exact normal CDF, and the degenerate final
    look."""
    from statistics import NormalDist

    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        _FUT_GAMMA,
        _OBF_Z,
        eval_ab_futility_power,
    )

    rows = eval_ab_futility_power(spark, SF_SMALL).collect()
    got = {r["d"]: r for r in rows}
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize().dt.date
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    purch = ev[ev["event_type"] == "purchase"]
    nd = NormalDist()
    days = sorted(got)
    kk = len(days)
    crossed = False
    for k, day in enumerate(days, start=1):
        upto = purch[purch["d"] <= day]
        y = (
            users["user_id"]
            .map(upto.groupby("user_id")["cents"].sum())
            .fillna(0)
        )
        c = y[users["variant"] == 0].to_numpy(dtype=float)
        t = y[users["variant"] == 1].to_numpy(dtype=float)
        z = (t.mean() - c.mean()) / math.sqrt(
            t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
        )
        frac = k / kk
        if k >= kk:
            cp_ref = 1.0 if z > _OBF_Z else 0.0
        else:
            arg = (z / math.sqrt(frac) - _OBF_Z) / math.sqrt(1.0 - frac)
            cp_ref = nd.cdf(arg)
        r = got[day]
        assert r["t_stat"] == pytest.approx(z, abs=1e-5), day
        assert r["b_value"] == pytest.approx(z * math.sqrt(frac), abs=1e-5)
        # 6-dp arg quantization + polynomial error; the CDF slope is
        # <= 0.4, so 1e-6 arg error -> <= 4e-7 CP error, plus 7.5e-8
        assert r["cp_trend"] == pytest.approx(cp_ref, abs=5e-6), day
        assert r["futility_stop"] == (r["cp_trend"] < _FUT_GAMMA)
        crossed = crossed or r["futility_stop"]
        assert r["stopped_by_now"] == crossed


def test_cluster_icc_matches_numpy(spark):
    """ICC / design effect against a scratch numpy one-way ANOVA over
    float cents (the engine uses exact decimal moments with
    floor-divided per-cluster terms; agreement to 1e-6 absolute covers
    the documented <= 1-unit-per-cluster floor bias)."""
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_cluster_icc,
    )

    r = eval_ab_cluster_icc(spark, SF_SMALL).collect()[0]
    orders = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    y = (orders["o_totalprice"] * 100).round().astype("int64")
    c = orders["o_custkey"]
    df = pd.DataFrame({"c": c, "y": y.astype(float)})
    k = df["c"].nunique()
    n = len(df)
    g = df.groupby("c")["y"]
    ssb = (g.sum() ** 2 / g.size()).sum() - df["y"].sum() ** 2 / n
    ssw = (df["y"] ** 2).sum() - (g.sum() ** 2 / g.size()).sum()
    n0 = (n - (g.size() ** 2).sum() / n) / (k - 1)
    msb, msw = ssb / (k - 1), ssw / (n - k)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert r["n_clusters"] == k and r["n_orders"] == n
    assert r["mean_cluster_size"] == pytest.approx(n / k, abs=1e-6)
    assert r["n0"] == pytest.approx(n0, abs=1e-6)
    assert r["icc"] == pytest.approx(icc, abs=1e-6)
    assert r["design_effect"] == pytest.approx(
        1.0 + (n / k - 1) * icc, abs=1e-6
    )


def test_hte_deciles_matches_pandas(spark):
    """Exact decile boundaries and per-decile Welch effects against a
    pandas replay, including the small-cell NULL guards (the sf0.001
    15-user universe exercises them)."""
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        eval_ab_hte_deciles,
    )

    rows = {r["decile"]: r for r in eval_ab_hte_deciles(spark, SF_SMALL).collect()}
    ev = _events().copy()
    cut = pd.Timestamp("2024-01-08")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    pre = ev[ev["ts"] < cut].groupby("user_id").size()
    post = (
        ev[(ev["ts"] >= cut) & (ev["event_type"] == "purchase")]
        .groupby("user_id")["cents"]
        .sum()
    )
    users = pd.DataFrame({"user_id": sorted(ev["user_id"].unique())})
    users["n_pre"] = users["user_id"].map(pre).fillna(0).astype(int)
    users["y"] = users["user_id"].map(post).fillna(0).astype("int64")
    users["variant"] = users["user_id"].map(lambda u: _h60(str(u)) % 2)
    users = users.sort_values(["n_pre", "user_id"]).reset_index(drop=True)
    n = len(users)
    users["decile"] = (users.index * 10) // n
    assert set(rows) == set(users["decile"].unique())
    for d, grp in users.groupby("decile"):
        c = grp.loc[grp["variant"] == 0, "y"].to_numpy(dtype=float)
        t = grp.loc[grp["variant"] == 1, "y"].to_numpy(dtype=float)
        r = rows[d]
        assert (r["n_control"], r["n_treatment"]) == (len(c), len(t))
        if len(c) == 0:
            assert r["mean_control"] is None
        else:
            assert r["mean_control"] == pytest.approx(
                c.mean() / 100, abs=1e-5
            )
        if len(c) >= 2 and len(t) >= 2:
            vv = t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)
            if vv > 0:
                assert r["t_stat"] == pytest.approx(
                    (t.mean() - c.mean()) / math.sqrt(vv), abs=1e-5
                )
            else:
                assert r["t_stat"] is None
        else:
            assert r["t_stat"] is None


def test_sequential_panel_consistent_with_trajectories(spark):
    """The one-row decision panel must equal a pandas replay of the
    aggregation over the three (independently differential-tested)
    trajectory queries: first crossing days, final-look picks, and the
    committee decision rule."""
    from stock_data_warehouse_analytics_spark.plans.ab_testing2 import (
        _OBF_Z,
        eval_ab_futility_power,
        eval_ab_msprt,
        eval_ab_obf_spending,
        eval_ab_sequential_panel,
    )

    r = eval_ab_sequential_panel(spark, SF_SMALL).collect()[0]
    obf = sorted(
        eval_ab_obf_spending(spark, SF_SMALL).collect(), key=lambda x: x["d"]
    )
    fut = sorted(
        eval_ab_futility_power(spark, SF_SMALL).collect(),
        key=lambda x: x["d"],
    )
    ms = sorted(eval_ab_msprt(spark, SF_SMALL).collect(), key=lambda x: x["d"])
    first_eff = next((x["d"] for x in obf if x["stop_obf"]), None)
    first_fut = next((x["d"] for x in fut if x["futility_stop"]), None)
    first_ms = next((x["d"] for x in ms if x["rejected"]), None)
    assert r["first_efficacy_d"] == first_eff
    assert r["first_futility_d"] == first_fut
    assert r["first_msprt_d"] == first_ms
    assert r["n_looks"] == len(obf)
    assert r["final_t_stat"] == obf[-1]["t_stat"]
    assert r["final_cp"] == fut[-1]["cp_trend"]
    assert r["final_p_always_valid"] == ms[-1]["p_always_valid"]
    if first_eff is not None and (first_fut is None or first_eff <= first_fut):
        want = "stop_efficacy"
    elif first_fut is not None:
        want = "stop_futility"
    elif abs(r["final_t_stat"]) > _OBF_Z:
        want = "significant_at_horizon"
    else:
        want = "no_effect"
    assert r["decision"] == want
