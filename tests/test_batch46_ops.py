"""Permutation entropy / IQV vs brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_perm_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_perm_entropy,
    )

    out = t_perm_entropy(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    y = np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)
    from collections import Counter
    pat = Counter()
    for i in range(len(y) - 2):
        a, b, c = y[i], y[i + 1], y[i + 2]
        pat[(a < b) * 4 + (b < c) * 2 + (a < c)] += 1
    m = sum(pat.values())
    p = np.array([v / m for v in pat.values()])
    ent = float(-(p * np.log(p)).sum())
    assert int(out["n_triples"]) == m
    assert int(out["n_patterns"]) == len(pat)
    assert abs(out["entropy"] - ent) < 5e-5
    assert abs(out["normalized"] - ent / np.log(6)) < 5e-5
    assert out["entropy"] >= -1e-9


def test_iqv_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_iqv

    out = q_iqv(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    cnt = ev["event_type"].value_counts()
    N = int(cnt.sum())
    k = len(cnt)
    p = cnt.to_numpy() / N
    iqv = (k / (k - 1)) * (1 - (p ** 2).sum())
    assert int(out["k"]) == k and int(out["n"]) == N
    assert int(out["sum_sq"]) == int((cnt.to_numpy(np.int64) ** 2).sum())
    assert abs(out["iqv"] - iqv) < 5e-6
    assert 0.0 <= out["iqv"] <= 1.0 + 1e-9
