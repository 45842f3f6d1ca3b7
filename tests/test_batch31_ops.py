"""Durbin-Watson / Jarque-Bera vs brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    return np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)


def test_durbin_watson_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_durbin_watson,
    )

    out = t_durbin_watson(SF).iloc[0]
    y = _dense_hourly().astype(np.float64)
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    slope, intercept = np.polyfit(t, y, 1)
    e = y - slope * t - intercept
    dw = ((np.diff(e) ** 2).sum()) / ((e ** 2).sum())
    assert int(out["n_hours"]) == n
    assert abs(out["slope"] - slope) < 1e-5
    assert abs(out["dw"] - dw) < 1e-5
    # DW lives in [0, 4]; near 2 means no autocorrelation
    assert 0.0 <= out["dw"] <= 4.0


def test_jarque_bera_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_jarque_bera,
    )

    out = q_jarque_bera(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    for src, g in docs.groupby("source"):
        v = g["n_chars"].to_numpy(np.float64)
        n = len(v)
        mu = v.mean()
        m2 = ((v - mu) ** 2).mean()
        m3 = ((v - mu) ** 3).mean()
        m4 = ((v - mu) ** 4).mean()
        skew = m3 / m2 ** 1.5
        kurt = m4 / m2 ** 2 - 3
        jb = n / 6 * (skew ** 2 + kurt ** 2 / 4)
        assert int(out.loc[src, "n"]) == n
        assert abs(out.loc[src, "skew"] - skew) < 1e-4
        assert abs(out.loc[src, "kurtosis"] - kurt) < 1e-4
        assert abs(out.loc[src, "jb"] - jb) < 1e-2
        assert out.loc[src, "jb"] >= -1e-9
