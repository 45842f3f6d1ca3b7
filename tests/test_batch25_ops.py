"""Change point / ABC classes / temporal integrity vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    return np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)


def test_changepoint_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_changepoint,
    )

    out = t_changepoint(SF).iloc[0]
    y = _dense_hourly().astype(np.float64)
    n = len(y)
    best_k, best_sse = None, np.inf
    tot_sq = (y ** 2).sum()
    for k in range(1, n):
        l, r = y[:k], y[k:]
        sse = (tot_sq - l.sum() ** 2 / k - r.sum() ** 2 / (n - k))
        if sse < best_sse - 1e-9:
            best_sse, best_k = sse, k
    assert int(out["split_k"]) == best_k
    assert abs(out["left_mean"] - y[:best_k].mean()) < 5e-6
    assert abs(out["right_mean"] - y[best_k:].mean()) < 5e-6
    # gain equals the variance-explained identity
    base_sse = tot_sq - y.sum() ** 2 / n
    assert abs(out["gain"] - (base_sse - best_sse)) < 5e-3
    assert out["gain"] >= -1e-9


def test_abc_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_abc

    out = q_abc(SF).set_index("cls")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    li = li.assign(rev=np.floor(li["l_extendedprice"].to_numpy() * 100
                                + 0.5).astype(np.int64))
    p = li.groupby("l_partkey")["rev"].sum().reset_index() \
        .sort_values(["rev", "l_partkey"], ascending=[False, True])
    total = int(p["rev"].sum())
    cum = p["rev"].cumsum().to_numpy()
    cls = np.where(cum * 5 <= 4 * total, "A",
                   np.where(cum * 20 <= 19 * total, "B", "C"))
    for c in ("A", "B", "C"):
        assert int(out.loc[c, "n_parts"]) == int((cls == c).sum())
        assert int(out.loc[c, "revenue_cents"]) == \
            int(p["rev"].to_numpy()[cls == c].sum())
    # classes partition all parts; shares sum to ~1
    assert int(out["n_parts"].sum()) == p["l_partkey"].nunique()
    assert abs(out["share"].sum() - 1.0) < 1e-5
    # Pareto shape: A has the largest revenue share
    assert out.loc["A", "share"] >= out.loc["B", "share"] >= 0


def test_integrity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_integrity,
    )

    out = t_integrity(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    t = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(t=t)
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["t"].min()
    p = ev[ev["event_type"] == "purchase"].groupby("user_id")["t"].min()
    users = ev["user_id"].unique()
    s = s.reindex(users)
    p = p.reindex(users)
    both = s.notna() & p.notna()
    assert int(out["n_users"]) == len(users)
    assert int(out["n_purchase_before_signup"]) == \
        int((p[both] < s[both]).sum())
    assert int(out["n_orphan_purchasers"]) == int((p.notna() & s.isna()).sum())
    assert int(out["n_signup_only"]) == int((s.notna() & p.isna()).sum())
