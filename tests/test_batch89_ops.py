"""Batch 89: CMH stratified 2x2, Holt linear-trend forecast skill,
within-nation revenue Gini."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cmh_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cmh_test,
    )

    out = q_cmh_test(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount",
                                  "l_returnflag"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
    e = (np.floor(j["l_discount"].to_numpy() * 100 + 0.5) >= 6)
    r = (j["l_returnflag"] == "R").to_numpy()
    nat = j["c_nationkey"].to_numpy()
    sum_a = sum_e = sum_v = 0.0
    na = 0
    n_strata = 0
    for k in sorted(set(nat)):
        m = nat == k
        a = int((e[m] & r[m]).sum())
        b = int((e[m] & ~r[m]).sum())
        c = int((~e[m] & r[m]).sum())
        d = int((~e[m] & ~r[m]).sum())
        n = a + b + c + d
        if n < 2:
            continue
        n_strata += 1
        na += a
        sum_a += a
        sum_e += (a + b) * (a + c) / n
        sum_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    cmh = (sum_a - sum_e) ** 2 / sum_v
    row = out.iloc[0]
    assert row["n_strata"] == n_strata
    assert row["n_exposed_returned"] == na
    assert abs(row["cmh_chi2"] - cmh) < 1e-4


def test_holt_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_holt_forecast,
    )

    out = t_holt_forecast(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    y = np.zeros(H, np.int64)
    for hv, n in h.value_counts().items():
        y[int(hv) - lo] = n
    # independent float recursion (tolerance absorbs the micro-floor)
    lvl, tr = float(y[0]), float(y[1] - y[0])
    err = naive = 0.0
    for t in range(1, H):
        f = lvl + tr
        err += abs(y[t] - f)
        naive += abs(float(y[t] - y[t - 1]))
        l_new = (y[t] + lvl + tr) / 2
        tr = (l_new - lvl) / 4 + 3 * tr / 4
        lvl = l_new
    row = out.iloc[0]
    assert row["n_hours"] == H
    assert abs(row["mae_holt"] - err / (H - 1)) < 1e-2
    assert abs(row["mae_naive"] - naive / (H - 1)) < 2e-6
    assert abs(row["skill_vs_naive"] - err / naive) < 1e-3


def test_grouped_gini_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_grouped_gini,
    )

    out = q_grouped_gini(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    od["rev"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    per = od.groupby("o_custkey", as_index=False)["rev"].sum() \
        .merge(cu, left_on="o_custkey", right_on="c_custkey")
    for k, grp in per.groupby("c_nationkey"):
        x = np.sort(grp["rev"].to_numpy(np.int64))
        n = len(x)
        s1 = int(np.dot(np.arange(1, n + 1, dtype=object),
                        x.astype(object)))
        sx = int(x.sum())
        gini = (2 * s1 - (n + 1) * sx) / (n * sx)
        row = out[out["nationkey"] == k].iloc[0]
        assert row["n_cust"] == n
        assert row["total_cents"] == sx
        assert abs(row["gini"] - gini) < 2e-6
