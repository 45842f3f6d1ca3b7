"""Batch 96: anomaly persistence, Weibull gap fit, repurchase
acceleration sign test."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _hourly(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    h = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    y = np.zeros(hi - lo + 1, np.int64)
    vc = h.value_counts()
    y[vc.index.to_numpy(np.int64) - lo] = vc.to_numpy(np.int64)
    return y


def test_anomaly_persistence_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_anomaly_persistence,
    )

    out = t_anomaly_persistence(SF)
    y = _hourly(SF)
    n = len(y)
    mu = y.mean()
    sd = y.std()
    flag = y > mu + 2 * sd
    a, b = flag[:-1], flag[1:]
    row = out.iloc[0]
    assert row["n_hours"] == n
    assert row["n_spikes"] == int(flag.sum())
    assert row["n11"] == int((a & b).sum())
    assert row["n10"] == int((a & ~b).sum())
    assert row["n01"] == int((~a & b).sum())
    assert row["n00"] == int((~a & ~b).sum())
    if row["n11"] + row["n10"] > 0:
        pers = row["n11"] / (row["n11"] + row["n10"])
        assert abs(row["persistence"] - pers) < 2e-6
        assert abs(row["lift_vs_base"]
                   - pers / (flag.sum() / n)) < 1e-4


def test_weibull_gaps_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_weibull_gaps,
    )

    out = t_weibull_gaps(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = ev["user_id"].to_numpy(np.int64)
    same = u[1:] == u[:-1]
    gaps = (t[1:] - t[:-1])[same] // 1_000_000
    pos = gaps[gaps > 0]
    ln = np.log(pos.astype(np.float64))
    k = (np.pi / np.sqrt(6)) / ln.std()
    lam = np.exp(ln.mean() + 0.5772156649015329 / k)
    row = out.iloc[0]
    assert row["n_gaps"] == len(pos)
    assert row["n_zero_gaps"] == int((gaps == 0).sum())
    assert abs(row["weibull_k"] - k) < 1e-4
    assert abs(row["weibull_scale_s"] - lam) / lam < 1e-4


def test_repurchase_acceleration_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_repurchase_acceleration,
    )

    out = q_repurchase_acceleration(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_orderkey"])
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    od["d"] = od["o_orderdate"].astype("datetime64[us]") \
        .astype(np.int64) // 86_400_000_000
    a = d = t = 0
    for _, g in od.groupby("o_custkey"):
        if len(g) < 3:
            continue
        dd = g["d"].to_numpy()
        first = dd[1] - dd[0]
        last = dd[-1] - dd[-2]
        if last < first:
            a += 1
        elif last > first:
            d += 1
        else:
            t += 1
    row = out.iloc[0]
    assert row["n_tested"] == a + d + t
    assert row["accelerating"] == a
    assert row["decelerating"] == d
    assert row["tied"] == t
    if a + d:
        assert abs(row["sign_z"]
                   - (2 * a - (a + d)) / np.sqrt(a + d)) < 1e-4
