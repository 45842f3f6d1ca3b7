"""Batch 101: engagement Gini / participation inequality, return-rate
drift across ship months, dow-adjusted daily anomaly census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_engagement_gini_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_engagement_gini,
    )

    out = t_engagement_gini(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    per = ev.groupby("user_id").size().to_numpy(np.int64)
    x = np.sort(per)
    n = len(x)
    tot = int(x.sum())
    i = np.arange(1, n + 1)
    gini = (2 * (i * x).sum() - (n + 1) * tot) / (n * tot)
    xs = np.sort(per)[::-1]
    row = out.iloc[0]
    assert row["n_users"] == n
    assert row["n_events"] == tot
    assert abs(row["gini"] - gini) < 2e-6
    assert abs(row["top10_share"] - xs[: n // 10].sum() / tot) < 2e-6
    assert abs(row["top1_share"] - xs[: n // 100].sum() / tot) < 2e-6


def test_return_rate_drift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_return_rate_drift,
    )

    out = q_return_rate_drift(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_shipdate", "l_returnflag"])
    li["m"] = li["l_shipdate"].dt.year * 100 + li["l_shipdate"].dt.month
    li["r"] = (li["l_returnflag"] == "R").astype(int)
    g = li.groupby("m").agg(n=("r", "size"), r=("r", "sum"))
    p = g["r"].sum() / g["n"].sum()
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["ship_month"]]
        assert row["n_lines"] == e["n"]
        assert row["n_returned"] == e["r"]
        assert abs(row["return_rate"] - e["r"] / e["n"]) < 2e-6
        z = (e["r"] - e["n"] * p) / np.sqrt(e["n"] * p * (1 - p))
        assert abs(row["binom_z"] - z) < 1e-4


def test_dow_adjusted_anomaly_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_dow_adjusted_anomaly,
    )

    out = t_dow_adjusted_anomaly(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    d = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    cnt = pd.Series(d).value_counts().sort_index()
    full = pd.Series(0, index=range(int(d.min()), int(d.max()) + 1))
    full.update(cnt)
    assert len(out) == 7
    for _, row in out.iterrows():
        y = full[full.index % 7 == row["dow"]].to_numpy(np.int64)
        mu, sd = y.mean(), y.std()
        assert row["n_days"] == len(y)
        assert abs(row["mean_events"] - mu) < 2e-6
        n_anom = int((np.abs(y - mu) > 2 * sd).sum())
        assert row["n_anomalous"] == n_anom
        if sd > 0:
            assert abs(row["max_abs_z"]
                       - np.abs(y - mu).max() / sd) < 1e-4
