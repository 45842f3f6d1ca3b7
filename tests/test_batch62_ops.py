"""Batch 62: supply concentration, conversion lag, basket diversity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_supply_concentration_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supply_concentration,
    )

    out = q_supply_concentration(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"])
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(int)
    g = li.groupby(["l_partkey", "l_suppkey"])["q"].sum()
    ns = g.groupby(level=0).size()
    assert out["n_parts"].iloc[0] == len(ns)
    assert out["single_sourced"].iloc[0] == int((ns == 1).sum())
    assert out["dual_sourced"].iloc[0] == int((ns == 2).sum())
    assert out["multi_sourced"].iloc[0] == int((ns > 2).sum())
    hhis = []
    for _p, sub in g.groupby(level=0):
        q = sub.to_numpy(float)
        hhis.append((q ** 2).sum() / q.sum() ** 2)
    assert abs(out["mean_hhi"].iloc[0] - np.mean(hhis)) < 1e-5
    # HHI of a share vector lives in (0, 1]
    assert 0.0 < out["mean_hhi"].iloc[0] <= 1.0 + 1e-9


def test_conversion_lag_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_conversion_lag,
    )

    out = t_conversion_lag(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["us"].min()
    lags = []
    for u, t0 in s.items():
        pu = ev[(ev["event_type"] == "purchase") & (ev["user_id"] == u)
                & (ev["us"] >= t0)]["us"]
        if len(pu):
            lags.append((int(pu.min()) - int(t0)) // 3_600_000_000)
    lags = np.sort(np.array(lags))
    n = len(lags)
    assert out["n_converted"].iloc[0] == n
    assert out["median_lag_hours"].iloc[0] == lags[(n + 1) // 2 - 1]
    assert out["p90_lag_hours"].iloc[0] == lags[(9 * n + 9) // 10 - 1]
    assert abs(out["mean_lag_hours"].iloc[0] - lags.mean()) < 2e-6


def test_basket_diversity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_basket_diversity,
    )

    out = q_basket_diversity(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    k = m.groupby("l_orderkey")["p_brand"].nunique()
    hist = k.value_counts().sort_index()
    assert len(out) == len(hist)
    for nb, cnt in hist.items():
        assert out[out["n_brands"] == nb]["n_orders"].iloc[0] == cnt
    ref_mean = k.sum() / len(k)
    assert abs(out["mean_brands"].iloc[0] - ref_mean) < 2e-6
    assert int(out["n_orders"].sum()) == len(k)
