"""Cohort LTV / Mood's median test vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cohort_ltv_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_cohort_ltv,
    )

    out = t_cohort_ltv(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type", "value"])
    WEEK = 7 * 24 * 3_600_000_000
    w = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // WEEK
    ev = ev.assign(w=w,
                   c=np.floor(ev["value"].to_numpy() * 100 + 0.5)
                   .astype(np.int64))
    cohort = ev[ev["event_type"] == "signup"].groupby("user_id")["w"].min()
    p = ev[ev["event_type"] == "purchase"].merge(
        cohort.rename("cw").reset_index(), on="user_id")
    p = p[p["w"] >= p["cw"]].assign(age=lambda d: d["w"] - d["cw"])
    cells = p.groupby(["cw", "age"]).agg(n=("c", "size"), rev=("c", "sum"))
    sizes = cohort.value_counts()
    assert len(out) == len(cells)
    for _, r in out.iterrows():
        key = (int(r["cohort_week"]), int(r["age_weeks"]))
        assert int(r["n_purchases"]) == int(cells.loc[key, "n"])
        assert int(r["revenue_cents"]) == int(cells.loc[key, "rev"])
        assert int(r["cohort_users"]) == int(sizes.loc[key[0]])
    # cumulative revenue is per-cohort monotone and consistent
    for cw, g in out.groupby("cohort_week"):
        g = g.sort_values("age_weeks")
        assert (np.diff(g["cum_revenue_cents"].to_numpy()) >= 0).all()
        assert int(g["cum_revenue_cents"].iloc[-1]) == \
            int(g["revenue_cents"].sum())
        ltv = g["cum_revenue_cents"].iloc[-1] / g["cohort_users"].iloc[0] / 100
        assert abs(g["ltv_per_user"].iloc[-1] - ltv) < 5e-6


def test_median_test_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_median_test,
    )

    out = q_median_test(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    c = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    n = len(c)
    med = int(np.sort(c)[(n + 1) // 2 - 1])
    et = ev["event_type"].to_numpy()
    types = sorted(set(et))
    A = int((c > med).sum())
    chi2 = 0.0
    for t in types:
        tot = int((et == t).sum())
        a = int(((et == t) & (c > med)).sum())
        ea = tot * A / n
        eb = tot * (n - A) / n
        chi2 += (a - ea) ** 2 / ea + ((tot - a) - eb) ** 2 / eb
    assert int(out["n"]) == n
    assert int(out["median_cents"]) == med
    assert int(out["k"]) == len(types)
    assert int(out["n_above"]) == A
    assert abs(out["chi2"] - chi2) < 5e-4
    assert out["chi2"] >= -1e-9
