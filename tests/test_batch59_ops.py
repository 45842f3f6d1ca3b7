"""Batch 59: price indices, ACF half-life, seasonal Mann-Kendall."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_price_index_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_price_index,
    )

    out = q_price_index(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])
    us = li["l_shipdate"].astype("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(int)
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    li["half"] = (us >= mid).astype(int).to_numpy()
    agg = li.groupby(["l_partkey", "half"])[["q", "c"]].sum().unstack(
        fill_value=0)
    q0, q1 = agg[("q", 0)], agg[("q", 1)]
    c0, c1 = agg[("c", 0)], agg[("c", 1)]
    both = (q0 > 0) & (q1 > 0)
    # float reference (the engine floors each cross term; tolerance
    # covers the sub-cent truncation)
    lasp = ((c1[both] * q0[both] / q1[both]).sum()) / c0[both].sum()
    paas = c1[both].sum() / ((c0[both] * q1[both] / q0[both]).sum())
    assert out["n_parts_both"].iloc[0] == int(both.sum())
    assert abs(out["laspeyres"].iloc[0] - lasp) < 1e-4
    assert abs(out["paasche"].iloc[0] - paas) < 1e-4
    assert abs(out["fisher"].iloc[0]
               - np.sqrt(out["laspeyres"].iloc[0]
                         * out["paasche"].iloc[0])) < 2e-6
    # indices hover around 1 on a stationary price fixture
    assert 0.5 < out["laspeyres"].iloc[0] < 2.0


def test_acf_half_life_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_acf_half_life,
    )

    out = t_acf_half_life(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 3_600_000_000)
    counts = h.value_counts()
    h0, h1 = int(h.min()), int(h.max())
    y = np.zeros(h1 - h0 + 1, dtype=float)
    y[counts.index.to_numpy() - h0] = counts.to_numpy()
    n = len(y)

    def r(k):
        a, b = y[:-k], y[k:]
        num = (n * n * (a * b).sum()
               - n * y.sum() * (a.sum() + b.sum())
               + (n - k) * y.sum() ** 2)
        den = n * n * (y * y).sum() - n * y.sum() ** 2
        return num / den

    assert abs(out["r1"].iloc[0] - r(1)) < 2e-6
    hl = -1
    for k in range(1, 49):
        if r(k) < 0.5:
            hl = k
            break
    assert out["half_life_hours"].iloc[0] == hl
    if hl > 0:
        assert abs(out["r_at_half_life"].iloc[0] - r(hl)) < 2e-6
        assert out["r_at_half_life"].iloc[0] < 0.5
        for k in range(1, hl):
            assert r(k) >= 0.5


def test_seasonal_mk_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_seasonal_mk,
    )

    out = t_seasonal_mk(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    h = us // 3_600_000_000
    hourly = pd.Series(cents).groupby(h.to_numpy()).sum()
    h0, h1 = int(hourly.index.min()), int(hourly.index.max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[hourly.index.to_numpy() - h0] = hourly.to_numpy()
    hod = np.arange(h0, h1 + 1) % 24
    s = 0
    var18 = 0
    for k in range(24):
        x = grid[hod == k]
        nh = len(x)
        if nh < 2:
            continue
        for i in range(nh):
            for j in range(i + 1, nh):
                s += int(np.sign(x[j] - x[i]))
        var18 += nh * (nh - 1) * (2 * nh + 5)
        _v, t = np.unique(x, return_counts=True)
        var18 -= int(sum(c * (c - 1) * (2 * c + 5) for c in t))
    assert out["s_stat"].iloc[0] == s
    assert out["var18"].iloc[0] == var18
    delta = 1 if s > 0 else (-1 if s < 0 else 0)
    ref_z = (s - delta) / np.sqrt(var18 / 18.0)
    assert abs(out["z"].iloc[0] - ref_z) < 2e-6
