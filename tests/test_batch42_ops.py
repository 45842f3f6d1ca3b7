"""Effective sample size / Good-Turing coverage vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ess_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_ess

    out = t_ess(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    y = np.bincount(h - lo, minlength=hi - lo + 1).astype(np.float64)
    n = len(y)
    ym = y - y.mean()
    c0 = (ym ** 2).sum()
    rsum, k_used = 0.0, 0
    for k in range(1, 21):
        r = (ym[:-k] * ym[k:]).sum() / c0
        if round(r, 6) <= 0:
            break
        rsum += r
        k_used = k
    assert int(out["n_hours"]) == n
    assert int(out["k_used"]) == k_used
    assert abs(out["rho_sum"] - rsum) < 5e-5
    ess = n / (1 + 2 * rsum)
    assert abs(out["ess"] - ess) < 5e-2
    # ESS cannot exceed n (with positive truncated-sum autocorrelation)
    assert 0 < out["ess"] <= n + 1e-6


def test_good_turing_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_good_turing,
    )

    out = d_good_turing(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update((t or "").split())
        N = sum(cnt.values())
        n1 = sum(1 for v in cnt.values() if v == 1)
        n2 = sum(1 for v in cnt.values() if v == 2)
        assert int(out.loc[src, "n_tokens"]) == N
        assert int(out.loc[src, "vocab"]) == len(cnt)
        assert int(out.loc[src, "singletons"]) == n1
        assert int(out.loc[src, "doubletons"]) == n2
        assert abs(out.loc[src, "p_unseen"] - n1 / N) < 5e-6
        assert abs(out.loc[src, "coverage"] - (1 - n1 / N)) < 5e-6
        assert 0.0 <= out.loc[src, "p_unseen"] <= 1.0
