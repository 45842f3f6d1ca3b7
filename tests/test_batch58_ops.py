"""Batch 58: Simpson check, peak window, segment migration."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_simpson_check_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_simpson_check,
    )

    out = q_simpson_check(SF).set_index("returnflag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])
    li["x"] = np.floor(li["l_quantity"].to_numpy() + 0.5)
    li["y"] = np.floor(li["l_discount"].to_numpy() * 10000 + 0.5)
    agg = np.corrcoef(li["x"], li["y"])[0, 1]
    for rf, g in li.groupby("l_returnflag"):
        ref = np.corrcoef(g["x"], g["y"])[0, 1]
        r = out.loc[rf]
        assert r["n"] == len(g)
        assert abs(r["group_corr"] - ref) < 2e-6
        assert abs(r["agg_corr"] - agg) < 2e-6
        assert r["sign_flip"] == int(r["group_corr"] * r["agg_corr"] < 0)


def test_peak_window_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_peak_window,
    )

    out = t_peak_window(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 3_600_000_000)
    counts = h.value_counts()
    h0, h1 = int(h.min()), int(h.max())
    grid = np.zeros(h1 - h0 + 1, dtype=int)
    grid[counts.index.to_numpy() - h0] = counts.to_numpy()
    win = np.convolve(grid, np.ones(6, dtype=int), mode="valid")
    peak = int(win.max())
    start = h0 + int(np.argmax(win))
    assert out["peak_events"].iloc[0] == peak
    assert out["peak_start_hour"].iloc[0] == start
    ref_ptm = peak * len(grid) / (6 * grid.sum())
    assert abs(out["peak_to_mean"].iloc[0] - ref_ptm) < 2e-6
    assert out["peak_to_mean"].iloc[0] >= 1.0 - 1e-9  # max >= mean


def test_segment_migration_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_segment_migration,
    )

    out = t_segment_migration(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    p = ev[ev["event_type"] == "purchase"].copy()
    p["us"] = p["ts"].astype("datetime64[us]").astype(np.int64)
    p["cents"] = np.floor(p["value"].to_numpy() * 100 + 0.5).astype(int)
    h1 = p[p["us"] < mid].groupby("user_id")["cents"].sum()
    h2 = p[p["us"] >= mid].groupby("user_id")["cents"].sum()
    both = sorted(set(h1.index) & set(h2.index))
    n = len(both)

    def ntile(series):
        order = sorted(both, key=lambda u: (series[u], u))
        c, m = n // 5, n % 5
        res = {}
        for i, u in enumerate(order, start=1):
            if i <= m * (c + 1):
                res[u] = (i - 1) // (c + 1) + 1
            else:
                res[u] = m + (i - m * (c + 1) - 1) // c + 1
        return res

    q1, q2 = ntile(h1), ntile(h2)
    from collections import Counter
    ref = Counter((q1[u], q2[u]) for u in both)
    got = out.set_index(["q1", "q2"])["n_users"]
    assert len(got) == len(ref)
    for k, v in ref.items():
        assert got.loc[k] == v
    assert int(out["n_users"].sum()) == n
