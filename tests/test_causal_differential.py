"""Independent pure-Python/numpy differentials for the session-3
statistics (Shapley MTA, stratified ATT, Cohen's kappa, split
conformal, k-fold CV, DP noise, relational HLL).

Same stance as tests/test_ab_differential.py: the DuckDB oracle
mirrors share each query's FORMULA, so a formula error would pass the
oracle gate on both engines.  These tests recompute every statistic
from the raw parquet with an unrelated implementation (dict-based
journey enumeration, hashlib HLL, numpy lstsq, a plain-Python
recurrence) and compare — exactly for the integer-quantized columns,
to 1e-9 for the closed-form doubles.
"""

from __future__ import annotations

import hashlib
import itertools
import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMALL


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMALL}/events.parquet")


def _run(spark, name):
    from stock_data_warehouse_analytics_spark.plans.registry import (
        QUERIES,
        _ensure_loaded,
    )

    _ensure_loaded()
    return QUERIES[name].fn(spark, SF_SMALL).collect()


# ------------------------------------------------------------- Shapley


def _journeys(ev: pd.DataFrame):
    j = {}
    for r in ev.itertuples():
        key = (r.user_id, r.ts.date())
        sig, conv = j.setdefault(key, (set(), [0]))
        if r.event_type == "purchase":
            conv[0] = 1
        else:
            sig.add(r.event_type)
    return j


def test_attribution_shapley_matches_pure_python(spark):
    ev = _events()
    j = _journeys(ev)
    stats = {}  # sig -> [n, conv]
    for sig_set, conv in j.values():
        sig = ",".join(sorted(sig_set))
        n, c = stats.setdefault(sig, [0, 0])
        stats[sig][0] = n + 1
        stats[sig][1] = c + conv[0]
    v = {s: (c * 1_000_000_000) // n for s, (n, c) in stats.items()}
    channels = ["click", "error", "signup", "view"]
    want = {}
    for ch in channels:
        others = [c for c in channels if c != ch]
        total = 0
        for r in range(4):
            for s in itertools.combinations(others, r):
                w = math.factorial(len(s)) * math.factorial(3 - len(s))
                sig_wo = ",".join(sorted(s))
                sig_w = ",".join(sorted(s + (ch,)))
                total += w * (v.get(sig_w, 0) - v.get(sig_wo, 0))
        want[ch] = total
    got = {r.channel: r.shapley_nano24 for r in _run(spark, "attribution_shapley")}
    assert got == want
    # Shapley EFFICIENCY (exact integer identity, holds for any v with
    # the v(unobserved)=0 convention since the weighted sum telescopes):
    # Σ_i φ_i·24 = 24·(v(grand) − v(∅))
    grand = ",".join(sorted(channels))
    assert sum(got.values()) == 24 * (v.get(grand, 0) - v.get("", 0))


# ------------------------------------------------------- stratified ATT


def test_att_stratified_matches_pandas(spark):
    ev = _events()
    cut = pd.Timestamp("2024-01-08")
    ev = ev.copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    pre = ev[ev["ts"] < cut]
    n_pre = pre.groupby("user_id").size()
    err_pre = pre[pre["event_type"] == "error"].groupby("user_id").size()
    post = ev[(ev["ts"] >= cut) & (ev["event_type"] == "purchase")]
    y = post.groupby("user_id")["cents"].sum()
    users = pd.DataFrame({"user_id": ev["user_id"].unique()})
    users["n_pre"] = users["user_id"].map(n_pre).fillna(0).astype(int)
    users["err"] = users["user_id"].map(err_pre).fillna(0).astype(int)
    users["y"] = users["user_id"].map(y).fillna(0).astype("int64")
    users["treated"] = (users["err"] >= 3).astype(int)
    users["stratum"] = np.minimum(users["n_pre"] // 4, 5)
    rows = {}
    for s, g in users.groupby("stratum"):
        t, c = g[g.treated == 1], g[g.treated == 0]
        if len(t) and len(c):
            rows[int(s)] = (len(t), len(c), t["y"].sum(), c["y"].sum())
    n_t_total = sum(r[0] for r in rows.values())
    got = {r.stratum: r for r in _run(spark, "eval_att_stratified")}
    assert set(got) == set(rows)
    att_nano = 0
    for s, (nt, nc, st, sc) in rows.items():
        mt = st / 100.0 / nt
        mc = sc / 100.0 / nc
        diff = mt - mc
        contrib = math.floor(diff * (nt / n_t_total) * 1e9)
        att_nano += contrib
        g = got[s]
        assert (g.n_treated, g.n_control) == (nt, nc)
        assert abs(g.mean_treated - mt) < 1e-9
        assert abs(g.mean_control - mc) < 1e-9
        assert g.contrib_nano == contrib
    for g in got.values():
        assert abs(g.att - att_nano / 1e9) < 1e-12


# --------------------------------------------------------- Cohen's kappa


def test_cohens_kappa_matches_pure_python(spark):
    # independent heuristic-langid replica (same SPEC as
    # functions.text.predicted_lang, re-implemented with Python re)
    import re

    from stock_data_warehouse_analytics_spark.functions.text import (
        LANG_STOPWORDS,
    )

    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    langs = sorted(LANG_STOPWORDS)

    def predict(text: str) -> str:
        t = text.strip().lower()
        n = len(re.split(r"\s+", t))
        best, best_score = langs[0], None
        for lg in langs:
            rx = r"\b(" + "|".join(LANG_STOPWORDS[lg]) + r")\b"
            score = len(re.findall(rx, t)) / n
            if best_score is None or score > best_score:
                best, best_score = lg, score
        return best

    conf = {}
    for r in docs.itertuples():
        key = (r.lang, predict(r.text))
        conf[key] = conf.get(key, 0) + 1
    n = sum(conf.values())
    agree = sum(v for (a, b), v in conf.items() if a == b)
    rows = {}
    cols = {}
    for (a, b), v in conf.items():
        rows[a] = rows.get(a, 0) + v
        cols[b] = cols.get(b, 0) + v
    pe_num = sum(rows[k] * cols.get(k, 0) for k in rows)
    po = agree / n
    pe = pe_num / n / n
    kappa = (po - pe) / (1 - pe)
    [g] = _run(spark, "eval_cohens_kappa")
    assert (g.n_docs, g.n_agree, g.pe_num) == (n, agree, pe_num)
    assert abs(g.kappa - kappa) < 1e-12


# ------------------------------------------------------- split conformal


def test_conformal_coverage_matches_pure_python(spark):
    ev = _events()
    ev = ev.copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev["h"] = ev["ts"].astype("int64") // 1_000_000 // 3600
    hmin, hmax = int(ev["h"].min()), int(ev["h"].max())
    got = {r.event_type: r for r in _run(spark, "eval_conformal_coverage")}
    for etype, g in ev.groupby("event_type"):
        ys = g.groupby("h")["cents"].sum().to_dict()
        series = [(h, ys.get(h, 0)) for h in range(hmin, hmax + 1)]
        resid = [
            (h, abs(y - series[i - 24][1]), ((h - hmin) // 24) % 2)
            for i, (h, y) in enumerate(series)
            if i >= 24
        ]
        cal = sorted(
            [(r, h) for h, r, p in resid if p == 0]
        )  # (residual, hour) — rank ties broken by hour like the query
        n_cal = len(cal)
        k = (9 * (n_cal + 1) + 9) // 10
        q_hat = cal[k - 1][0]
        ev_side = [r for h, r, p in resid if p == 1]
        cov = sum(1 for r in ev_side if r <= q_hat) / len(ev_side)
        w = got[etype]
        assert (w.n_cal, w.n_eval, w.q_hat_cents) == (
            n_cal,
            len(ev_side),
            q_hat,
        ), etype
        assert abs(w.coverage - cov) < 1e-12


# ----------------------------------------------------------- k-fold CV


def test_kfold_cv_matches_numpy_lstsq(spark):
    ev = _events()
    ev = ev.copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    x = ev.groupby("user_id").size()
    y = (
        ev[ev["event_type"] == "purchase"]
        .groupby("user_id")["cents"]
        .sum()
    )
    users = pd.DataFrame({"user_id": x.index})
    users["x"] = users["user_id"].map(x).astype("int64")
    users["y"] = users["user_id"].map(y).fillna(0).astype("int64")
    users["fold"] = users["user_id"].map(lambda u: _h60(f"cv:{u}") % 5)
    got = {r.fold: r for r in _run(spark, "eval_kfold_cv_ols")}
    for f in sorted(users["fold"].unique()):
        tr = users[users.fold != f]
        te = users[users.fold == f]
        A = np.vstack([tr["x"].to_numpy(float), np.ones(len(tr))]).T
        slope, intercept = np.linalg.lstsq(
            A, tr["y"].to_numpy(float), rcond=None
        )[0]
        g = got[int(f)]
        assert (g.n_train, g.n_test) == (len(tr), len(te))
        assert abs(g.slope - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(g.intercept - intercept) < 1e-6 * max(1.0, abs(intercept))
        # RMSE replica uses the QUERY's quantization contract
        res = te["y"].to_numpy(float) - g.intercept - g.slope * te[
            "x"
        ].to_numpy(float)
        sq = np.round(res * res * 1e6).astype("int64").sum()
        rmse = math.sqrt(sq / 1e6 / len(te))
        assert abs(g.rmse_cents - rmse) < 1e-9


# ------------------------------------------------------------- DP noise


def test_dp_noise_matches_pure_python(spark):
    ev = _events()
    counts = ev.groupby("event_type").size().to_dict()
    got = {r.event_type: r for r in _run(spark, "dq_dp_noisy_counts")}
    den = 1 << 48
    for etype, n in counts.items():
        h = _h60(f"dp:{etype}") % den
        u_centered = (h + 0.5) / den - 0.5
        sgn = 1.0 if u_centered >= 0 else -1.0
        lap = -2.0 * sgn * math.log(1.0 - 2.0 * abs(u_centered))
        noise_nano = int(round(lap * 1e9))
        g = got[etype]
        assert g.n_true == n
        assert g.noise_nano == noise_nano, (etype, g.noise_nano, noise_nano)
        assert abs(g.noisy_count - (n * 1_000_000_000 + noise_nano) / 1e9) < 1e-12


# -------------------------------------------------------- relational HLL


def _hll_replica(keys):
    m, wbits = 256, 52
    reg = {}
    for key in keys:
        h = _h60(f"hll:{key}")
        bucket, w = h % m, h // m
        rho = wbits + 1
        for i in range(1, wbits + 1):
            if w >= (1 << (wbits - i)):
                rho = i
                break
        term = 1 << (53 - rho)
        reg[bucket] = min(reg.get(bucket, 1 << 62), term)
    z_int = sum(reg.values()) + (m - len(reg)) * (1 << 53)
    zeros = m - len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    num = alpha * m * m * float(1 << 53)
    e_raw = num / z_int
    if e_raw <= 2.5 * m and zeros > 0:
        est = round(m * math.log(m / zeros), 6)
    else:
        est = round(e_raw, 6)
    return z_int, zeros, est


def test_hll_relational_matches_pure_python(spark):
    ev = _events()
    got = {r.event_type: r for r in _run(spark, "sketch_hll_relational")}
    all_users = set()
    for etype, g in ev.groupby("event_type"):
        users = set(g["user_id"].tolist())
        all_users |= users
        z, zeros, est = _hll_replica(users)
        w = got[etype]
        assert (w.z_int, w.zeros, w.n_exact) == (z, zeros, len(users))
        assert abs(w.hll_estimate - est) < 1e-9
    z, zeros, est = _hll_replica(all_users)
    u = got["__union__"]
    assert (u.z_int, u.zeros, u.n_exact) == (z, zeros, len(all_users))
    assert abs(u.hll_estimate - est) < 1e-9
    # union monotonicity: merged registers can only lower terms, so the
    # union estimate is ≥ every per-type estimate (same-branch regime)
    assert all(
        u.hll_estimate >= got[t].hll_estimate - 1e-9
        for t in got
        if t != "__union__"
    )


# ------------------------------------------------- t-closeness (EMD)


def test_t_closeness_matches_pure_python(spark):
    """Per-class EMD against a dict-based recomputation: build each
    class's band histogram and the global one in plain Python, take
    the ordered-distance EMD as the mean absolute CDF gap, and compare
    the integer numerator exactly and the double to 1e-9."""
    rows = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in _run(spark, "dq_t_closeness")
    }
    cust = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    cust["b"] = np.floor(cust["c_acctbal"] / 1000.0).astype(int)
    bands = sorted(cust["b"].unique())
    n_total = len(cust)
    gl = cust.groupby("b").size().to_dict()
    for (nk, seg), grp in cust.groupby(["c_nationkey", "c_mktsegment"]):
        k = len(grp)
        cl = grp.groupby("b").size().to_dict()
        cc = cg = 0
        t_num = 0
        for b in bands:
            cc += cl.get(b, 0)
            cg += gl.get(b, 0)
            t_num += abs(cc * n_total - cg * k)
        r = rows[(nk, seg)]
        assert r["k"] == k
        assert r["m_bands"] == len(bands)
        assert r["t_num"] == t_num, (nk, seg)
        t_ref = t_num / k / n_total / (len(bands) - 1)
        assert abs(r["t_closeness"] - t_ref) < 1e-9
        assert r["breaches_t"] == (t_ref > 0.2)
    assert len(rows) == cust.groupby(["c_nationkey", "c_mktsegment"]).ngroups


# ------------------------------------- exponential-mechanism DP median


def test_dp_exponential_median_matches_pure_python(spark):
    """The Gumbel-max selection must equal a dict-based replay:
    per-type band CDF, integer utility, hashlib-uniform Gumbel, argmax
    on the nano-quantized score with band tiebreak; the exact-median
    audit column must be the true ⌈n/2⌉ band."""
    got = {r["event_type"]: r for r in _run(spark, "dq_dp_exponential_median")}
    ev = _events().copy()
    ev["band"] = ((ev["value"] * 100).round().astype("int64")) // 100
    bands = sorted(ev["band"].unique())
    den = 1 << 48
    eps = 0.5
    for et, grp in ev.groupby("event_type"):
        n = len(grp)
        cnt = grp.groupby("band").size().to_dict()
        cle = 0
        best = None
        true_med = None
        for b in bands:
            cle += cnt.get(b, 0)
            if true_med is None and 2 * cle >= n:
                true_med = b
            u = -abs(2 * cle - n)
            h = _h60(f"dpmed:{et}:{b}") % den
            u01 = (h + 0.5) / den
            g = -math.log(-math.log(u01))
            score_nano = int(round(((eps / 2.0) * u + g) * 1e9))
            key = (-score_nano, b)
            if best is None or key < best[0]:
                best = (key, b, u, score_nano)
        r = got[et]
        assert r["n"] == n
        assert r["released_band"] == best[1], et
        assert r["utility"] == best[2]
        assert r["score_nano"] == best[3]
        assert r["true_median_band"] == true_med
        assert r["epsilon"] == eps


# -------------------------------------------------- DP sum + histogram


def test_dp_clamped_sum_matches_pure_python(spark):
    """Clamp census, true sum and the Laplace draw replayed with
    hashlib + math.log — exact integer equality on every column."""
    got = {r["event_type"]: r for r in _run(spark, "dq_dp_clamped_sum")}
    ev = _events().copy()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    den = 1 << 48
    for et, grp in ev.groupby("event_type"):
        clamped = grp["cents"].clip(lower=0, upper=5000)
        h = _h60(f"dpsum:{et}") % den
        uc = (h + 0.5) / den - 0.5
        lap = -(5000.0 / 0.5) * (1.0 if uc >= 0 else -1.0) * math.log(
            1.0 - 2.0 * abs(uc)
        )
        noise_nano = int(round(lap * 1e9))
        r = got[et]
        assert r["n_events"] == len(grp)
        assert r["true_sum_cents"] == int(clamped.sum())
        assert r["n_clamped"] == int((grp["cents"] > 5000).sum())
        assert r["noise_nano"] == noise_nano
        assert r["noisy_sum_cents"] == (
            int(clamped.sum()) * 10**9 + noise_nano
        ) / 1e9


def test_dp_daily_histogram_matches_pure_python(spark):
    """Grid construction (empty cells included), counts and per-cell
    noise replayed in plain Python; released clamp checked."""
    got = {
        (r["d"], r["event_type"]): r
        for r in _run(spark, "dq_dp_daily_histogram")
    }
    ev = _events().copy()
    ev["d"] = ev["ts"].dt.normalize().dt.date
    days = pd.date_range(ev["d"].min(), ev["d"].max()).date
    types = sorted(ev["event_type"].unique())
    counts = ev.groupby(["d", "event_type"]).size().to_dict()
    den = 1 << 48
    assert len(got) == len(days) * len(types)
    for d in days:
        for et in types:
            n_true = counts.get((d, et), 0)
            h = _h60(f"dph:{d.isoformat()}:{et}") % den
            uc = (h + 0.5) / den - 0.5
            lap = -(1.0 / 0.5) * (1.0 if uc >= 0 else -1.0) * math.log(
                1.0 - 2.0 * abs(uc)
            )
            noise_nano = int(round(lap * 1e9))
            r = got[(d, et)]
            assert r["n_true"] == n_true
            assert r["noise_nano"] == noise_nano
            noisy = (n_true * 10**9 + noise_nano) / 1e9
            assert r["noisy_count"] == noisy
            assert r["released_count"] == max(0.0, noisy)


# ------------------------------------------------------ AMS F2 sketch


def test_ams_f2_matches_pure_python(spark):
    """The 16-estimator AMS pipeline replayed with hashlib + dicts:
    signs, Z sums, squares, floor-divided group means, lower median —
    exact integer equality, and the estimate must actually estimate
    (rel_error sanity-bounded)."""
    r = _run(spark, "sketch_ams_f2")[0]
    ev = _events()
    freq = ev.groupby("user_id").size().to_dict()
    zs = []
    for j in range(16):
        z = sum(
            (1 - 2 * (_h60(f"ams:{j}:{u}") % 2)) * f
            for u, f in freq.items()
        )
        zs.append(z)
    xs = [z * z for z in zs]
    grp_means = [sum(xs[g * 4:(g + 1) * 4]) // 4 for g in range(4)]
    est = sorted(grp_means)[1]  # lower median (rank 2 of 4)
    f2 = sum(f * f for f in freq.values())
    assert r["f2_exact"] == f2
    assert r["f2_estimate"] == est
    assert r["rel_error"] == round(abs(est - f2) / f2, 6)
    assert r["rel_error"] < 1.0  # sanity: the sketch is in the ballpark


# ----------------------------------------------- DP ledger completeness


def test_dp_ledger_enumerates_every_release(spark):
    """GOVERNANCE GUARD: the privacy-budget ledger must carry one row
    per registered dq_dp_* release against events — the round-6 review
    caught the ledger understating the family after two releases
    shipped without rows; this pins the maintenance coupling noted in
    the ledger docstring.  Also re-derives Σε sequentially from the
    per-row ε as an exactness check."""
    from stock_data_warehouse_analytics_spark.plans.registry import (
        QUERIES,
        _ensure_loaded,
    )

    _ensure_loaded()
    releases = {
        n
        for n in QUERIES
        if n.startswith("dq_dp_") and n != "dq_dp_budget_ledger"
    }
    rows = _run(spark, "dq_dp_budget_ledger")
    assert {r["release"] for r in rows} == releases
    running = 0.0
    for r in sorted(rows, key=lambda r: r["release_order"]):
        running += r["epsilon"]
        assert r["eps_cumulative"] == running


# ------------------------------------------- discrete Gaussian (zCDP)


def test_dp_discrete_gaussian_matches_pure_python(spark):
    """Re-derive the discrete-Gaussian release end-to-end with an
    INDEPENDENT implementation: recompute the quantized weight table
    from math.exp, the uniform from md5, and the inverse-CDF draw with
    bisect — nothing shared with the Spark/oracle plans except the
    mechanism's published spec (σ, B, the 2^40 quantizer, the key
    format)."""
    import bisect

    SIGMA, B = 20, 150
    cums, c = [], 0
    for z in range(-B, B + 1):
        c += round((1 << 40) * math.exp(-(z * z) / (2.0 * SIGMA * SIGMA)))
        cums.append(c)
    T = cums[-1]
    ev = _events()
    true_counts = ev.groupby("event_type").size().to_dict()
    rows = {r["event_type"]: r for r in _run(spark, "dq_dp_discrete_gaussian_counts")}
    assert set(rows) == set(true_counts)
    for et, n in true_counts.items():
        u = _h60(f"dgauss:{et}") % T
        z = bisect.bisect_right(cums, u) - B
        r = rows[et]
        assert r["n_true"] == n
        assert r["z_noise"] == z
        assert r["noisy_count"] == n + z
        assert r["rho_zcdp"] == 1.0 / (2 * SIGMA * SIGMA)
    # the draws must actually vary across types (not all the same cell)
    assert len({r["z_noise"] for r in rows.values()}) > 1


# ----------------------------------------------- Misra-Gries summary


def test_misra_gries_matches_pure_python(spark):
    """Independent re-derivation of the threshold-form Misra-Gries
    summary: exact per-user counts from pandas, md5 bucketing, the
    (k+1)-th-largest threshold per bucket, survivors and the global
    top-10 — plus the sketch's GUARANTEE (every kept estimate
    underestimates by at most its bucket threshold, and any user with
    true count above the summed slack must survive)."""
    K, BUCKETS, TOP = 8, 32, 10
    ev = _events()
    counts = ev.groupby("user_id").size().to_dict()
    buckets: dict[int, list] = {}
    for u, c in counts.items():
        b = _h60(f"mg:{u}") % BUCKETS
        buckets.setdefault(b, []).append((u, c))
    survivors, slack = {}, 0
    for b, items in buckets.items():
        ranked = sorted(items, key=lambda t: (-t[1], t[0]))
        t = ranked[K][1] if len(ranked) > K else 0
        slack += t
        for u, c in items:
            if c > t:
                survivors[u] = (c - t, c, t)
    top = sorted(survivors.items(), key=lambda kv: (-kv[1][0], kv[0]))[:TOP]
    rows = _run(spark, "sketch_misra_gries_topk")
    assert len(rows) == min(TOP, len(survivors))
    for rk, (r, (u, (est, c, t))) in enumerate(zip(rows, top), start=1):
        assert (r["user_id"], r["est_count"], r["true_count"], r["rk"]) == (
            u, est, c, rk
        )
        assert r["underestimate"] == c - est <= t  # per-bucket bound
        assert r["max_possible_underestimate"] == slack
    # guarantee: a user with true count above the global slack survives
    for u, c in counts.items():
        if c > slack:
            assert u in survivors
