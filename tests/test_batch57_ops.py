"""Batch 57: reorder gaps, char entropy, seasonal strength."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_reorder_gap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_reorder_gap,
    )

    out = t_reorder_gap(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["day"] = (od["o_orderdate"].astype("datetime64[us]")
                 .astype(np.int64) // 86_400_000_000)
    gaps = []
    for _u, g in od.groupby("o_custkey"):
        d = np.sort(g["day"].to_numpy())
        gaps.extend(np.diff(d).tolist())
    gaps = np.sort(np.array(gaps))
    n = len(gaps)
    assert out["n_gaps"].iloc[0] == n
    assert out["median_gap_days"].iloc[0] == gaps[(n + 1) // 2 - 1]
    assert out["p90_gap_days"].iloc[0] == gaps[(9 * n + 9) // 10 - 1]
    assert abs(out["mean_gap_days"].iloc[0] - gaps.mean()) < 2e-6
    assert out["median_gap_days"].iloc[0] <= out["p90_gap_days"].iloc[0]


def test_char_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_char_entropy,
    )

    out = d_char_entropy(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    for src, g in docs.groupby("source"):
        cnt = Counter("".join(t or "" for t in g["text"]))
        tot = sum(cnt.values())
        h = -sum((c / tot) * np.log2(c / tot) for c in cnt.values())
        r = out.loc[src]
        assert r["n_chars"] == tot
        assert r["n_distinct_chars"] == len(cnt)
        assert abs(r["h_bits"] - h) < 5e-5
        assert -1e-9 <= r["h_bits"] <= np.log2(len(cnt)) + 1e-9


def test_seasonal_strength_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_seasonal_strength,
    )

    out = t_seasonal_strength(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    h = us // 3_600_000_000
    hourly = pd.Series(cents).groupby(h.to_numpy()).sum()
    h0, h1 = int(hourly.index.min()), int(hourly.index.max())
    grid = np.zeros(h1 - h0 + 1, dtype=float)
    grid[hourly.index.to_numpy() - h0] = hourly.to_numpy()
    hod = np.arange(h0, h1 + 1) % 24
    gm = grid.mean()
    sst = ((grid - gm) ** 2).sum()
    ssb = 0.0
    means = {}
    for k in range(24):
        sel = hod == k
        if sel.sum():
            means[k] = grid[sel].mean()
            ssb += sel.sum() * (means[k] - gm) ** 2
    assert out["n_hours"].iloc[0] == len(grid)
    assert abs(out["seasonal_strength"].iloc[0] - ssb / sst) < 1e-4
    assert 0.0 - 1e-9 <= out["seasonal_strength"].iloc[0] <= 1.0 + 1e-9
    ref_peak = max(means, key=lambda k: (means[k], -k))
    assert out["peak_hour"].iloc[0] == ref_peak
