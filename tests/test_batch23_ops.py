"""Hill tail index / Ljung-Box / runs test vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    return np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)


def test_hill_tail_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_hill_tail

    out = d_hill_tail(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    K = 10
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.float64))[::-1]
        assert len(v) >= K + 1, "fixture must have > K docs per source"
        xk1 = v[K]
        hill_inv = np.log(v[:K] / xk1).mean()
        assert int(out.loc[src, "x_k1"]) == int(xk1)
        assert abs(out.loc[src, "hill_inv"] - hill_inv) < 5e-6
        if hill_inv > 0:
            assert abs(out.loc[src, "alpha"] - 1.0 / hill_inv) < 5e-4
        # tail index must be positive for positive data with spread
        assert out.loc[src, "hill_inv"] >= 0.0


def test_ljung_box_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_ljung_box,
    )

    out = t_ljung_box(SF).set_index("lag")
    y = _dense_hourly().astype(np.float64)
    n = len(y)
    ybar = y.mean()
    c0 = ((y - ybar) ** 2).sum()
    q = 0.0
    for k in range(1, 7):
        r = ((y[:-k] - ybar) * (y[k:] - ybar)).sum() / c0
        q += r * r / (n - k)
        assert abs(out.loc[k, "r"] - r) < 5e-6
        assert abs(out.loc[k, "q_stat"] - n * (n + 2) * q) < 5e-2
        assert -1.0 - 1e-9 <= out.loc[k, "r"] <= 1.0 + 1e-9
    # Q is non-decreasing in the number of lags
    assert (np.diff(out["q_stat"].to_numpy()) >= -1e-9).all()


def test_runs_test_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_runs_test,
    )

    out = q_runs_test(SF).iloc[0]
    y = _dense_hourly()
    n = len(y)
    med = int(np.sort(y)[(n + 1) // 2 - 1])
    above = y > med
    runs = 1 + int((above[1:] != above[:-1]).sum())
    n1, n0 = int(above.sum()), n - int(above.sum())
    assert int(out["n"]) == n and int(out["median"]) == med
    assert int(out["n_above"]) == n1 and int(out["n_below"]) == n0
    assert int(out["runs"]) == runs
    mu = 1 + 2 * n1 * n0 / n
    s2 = 2 * n1 * n0 * (2 * n1 * n0 - n) / (n * n * (n - 1))
    assert abs(out["z"] - (runs - mu) / np.sqrt(s2)) < 5e-6
    # runs count is bounded by the alternation maximum
    assert 1 <= runs <= 2 * min(n1, n0) + 1
