"""Batch 55: Kruskal-Wallis, Gumbel block maxima, Neyman allocation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kruskal_wallis_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_kruskal_wallis,
    )

    out = q_kruskal_wallis(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    v = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    ranks = pd.Series(v).rank(method="average").to_numpy()
    n = len(v)
    h = 0.0
    for _et, idx in pd.Series(range(n)).groupby(ev["event_type"].values):
        rj = ranks[idx.to_numpy()]
        h += rj.sum() ** 2 / len(rj)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _vals, t = np.unique(v, return_counts=True)
    c = 1.0 - (t.astype(float) ** 3 - t).sum() / (n ** 3 - n)
    assert out["n"].iloc[0] == n
    assert abs(out["h"].iloc[0] - h) < 1e-4
    assert abs(out["h_tie_corrected"].iloc[0] - h / c) < 1e-4
    assert out["h"].iloc[0] >= -1e-6


def test_gumbel_maxima_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_gumbel_maxima,
    )

    out = q_gumbel_maxima(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    h = us // 3_600_000_000
    hourly = pd.Series(cents).groupby(h.to_numpy()).sum()
    h0, h1 = int(hourly.index.min()), int(hourly.index.max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[hourly.index.to_numpy() - h0] = hourly.to_numpy()
    kw = len(grid) // 168
    mx = grid[:kw * 168].reshape(kw, 168).max(axis=1).astype(float)
    mean, s = mx.mean(), mx.std(ddof=1)
    scale = np.sqrt(6) / np.pi * s
    loc = mean - 0.5772156649015329 * scale
    assert out["n_weeks"].iloc[0] == kw
    assert abs(out["mean_max"].iloc[0] - mean / 100) < 1e-4
    assert abs(out["gumbel_scale"].iloc[0] - scale / 100) < 1e-4
    assert abs(out["gumbel_loc"].iloc[0] - loc / 100) < 1e-4
    # the Gumbel location sits below the mean of maxima
    assert out["gumbel_loc"].iloc[0] < out["mean_max"].iloc[0]


def test_neyman_alloc_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_neyman_alloc,
    )

    out = q_neyman_alloc(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    xq = {}
    for et, g in ev.groupby("event_type"):
        x = len(g) * g["cents"].std(ddof=1)
        xq[et] = int(np.floor(x * 1e3 + 0.5005))
    tot = sum(xq.values())
    base = {et: (10_000 * x) // tot for et, x in xq.items()}
    rem = {et: (10_000 * x) % tot for et, x in xq.items()}
    left = 10_000 - sum(base.values())
    for et in sorted(xq, key=lambda e: (-rem[e], e))[:left]:
        base[et] += 1
    got = out.set_index("event_type")
    for et in xq:
        assert got.loc[et, "weight_milli"] == xq[et]
        assert got.loc[et, "alloc"] == base[et]
    # the budget is spent exactly
    assert int(out["alloc"].sum()) == 10_000
    # variance-heavier strata get at least a proportional-ish share:
    # allocation ordering follows the weight ordering
    w = out.sort_values("weight_milli")["alloc"].to_numpy()
    assert (np.diff(w) >= 0).all()
