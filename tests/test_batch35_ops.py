"""Cross-correlation / ratio-metric delta test vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_xcorr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_xcorr

    out = t_xcorr(SF).set_index("lag")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1

    def dense(et):
        return np.bincount(h[ev["event_type"].to_numpy() == et] - lo,
                           minlength=H).astype(np.float64)

    x, y = dense("click"), dense("purchase")
    xm, ym = x - x.mean(), y - y.mean()
    denom = np.sqrt((xm ** 2).sum() * (ym ** 2).sum())
    for k in range(-3, 4):
        if k >= 0:
            a, b = x[:H - k], y[k:]
        else:
            a, b = x[-k:], y[:H + k]
        r = ((a - x.mean()) * (b - y.mean())).sum() / denom
        assert int(out.loc[k, "n_overlap"]) == len(a)
        assert abs(out.loc[k, "r"] - r) < 5e-6
        assert -1.0 - 1e-9 <= out.loc[k, "r"] <= 1.0 + 1e-9


def test_ratio_delta_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_ratio_delta,
    )

    out = q_ratio_delta(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    u = ev.assign(c=cents).groupby("user_id").agg(x=("c", "sum"),
                                                  y=("c", "size"))
    u["treat"] = u.index.to_numpy() % 2 == 1

    def arm(t):
        g = u[u["treat"] == t]
        n = len(g)
        R = g["x"].sum() / g["y"].sum()
        ybar = g["y"].mean()
        vx = g["x"].var(ddof=1)
        vy = g["y"].var(ddof=1)
        cxy = np.cov(g["x"], g["y"], ddof=1)[0, 1]
        return n, R, (vx + R * R * vy - 2 * R * cxy) / (n * ybar * ybar)

    n_c, r_c, v_c = arm(False)
    n_t, r_t, v_t = arm(True)
    assert int(out["n_users_c"]) == n_c and int(out["n_users_t"]) == n_t
    assert abs(out["ratio_c"] - r_c / 100) < 5e-6
    assert abs(out["ratio_t"] - r_t / 100) < 5e-6
    assert abs(out["z"] - (r_t - r_c) / np.sqrt(v_t + v_c)) < 5e-5
    # arms partition the users
    assert n_c + n_t == ev["user_id"].nunique()
