"""Batch 129: ship-delay trend with retro share, hour-of-day value
curve, whale-set stability."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ship_delay_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_ship_delay_trend,
    )

    out = q_ship_delay_trend(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["y"] = j["o_orderdate"].dt.year
    j["d"] = (j["l_shipdate"].values.astype("datetime64[D]")
              .astype(np.int64)
              - j["o_orderdate"].values.astype("datetime64[D]")
              .astype(np.int64))
    years = sorted(j["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        d = np.sort(j.loc[j["y"] == row["year"], "d"].to_numpy())
        n = len(d)
        assert row["n_lines"] == n
        assert row["median_delay_days"] == d[(n + 1) // 2 - 1]
        assert abs(row["retro_share"] - (d < 0).mean()) < 2e-6


def test_hour_value_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_hour_value_profile,
    )

    out = t_hour_value_profile(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    ev["hr"] = ev["ts"].dt.hour
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("hr")["c"].agg(["size", "sum"])
    tot = g["sum"].sum()
    assert list(out["hour"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["hour"]]
        assert row["n_events"] == e["size"]
        assert abs(row["mean_value_cents"]
                   - e["sum"] / e["size"]) < 2e-6
        assert abs(row["value_share"] - e["sum"] / tot) < 2e-6


def test_whale_stability_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_whale_stability,
    )

    out = q_whale_stability(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["y"] = od["o_orderdate"].dt.year
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    r = od.groupby(["y", "o_custkey"])["c"].sum().reset_index()
    tops = {}
    for y, g in r.groupby("y"):
        g = g.sort_values(["c", "o_custkey"],
                          ascending=[False, True]).head(100)
        tops[y] = set(g["o_custkey"])
    years = sorted(tops)
    assert len(out) == len(years) - 1
    for _, row in out.iterrows():
        a, b = int(row["year_a"]), int(row["year_b"])
        k = min(len(tops[a]), len(tops[b]))
        ov = len(tops[a] & tops[b])
        assert row["top_k"] == k
        assert row["n_overlap"] == ov
        assert abs(row["stability"] - ov / k) < 2e-6
