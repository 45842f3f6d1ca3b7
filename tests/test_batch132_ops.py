"""Batch 132: session length-value correlation, discount
seasonality, behavioral diversification."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_session_value_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_session_value_corr,
    )

    out = t_session_value_corr(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64)
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    u = ev["user_id"].to_numpy()
    t = ev["t"].to_numpy()
    new = np.ones(len(ev), dtype=int)
    same = u[1:] == u[:-1]
    new[1:][same & (t[1:] - t[:-1] <= 30 * 60 * 1_000_000)] = 0
    ev["sid"] = np.cumsum(new)
    per = ev.groupby("sid")["c"].agg(["size", "sum"])
    r = np.corrcoef(per["size"].to_numpy(float),
                    per["sum"].to_numpy(float))[0, 1]
    row = out.iloc[0]
    assert row["n_sessions"] == len(per)
    assert abs(row["length_value_r"] - r) < 2e-6


def test_discount_by_month(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_discount_by_month,
    )

    out = q_discount_by_month(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount"])
    li["m"] = li["l_shipdate"].dt.month
    li["bp"] = np.floor(li["l_discount"] * 100 + 0.5).astype(int)
    g = li.groupby("m")["bp"].agg(["size", "mean"])
    assert list(out["month"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["month"]]
        assert row["n_lines"] == e["size"]
        assert abs(row["mean_discount_bp"] - e["mean"]) < 2e-6


def test_diversification(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_diversification,
    )

    out = t_diversification(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    k0s, k1s = [], []
    for _, g in ev.groupby("user_id"):
        fd = g["d"].min()
        if g["d"].max() - fd < 7:
            continue
        w0 = g[g["d"] - fd < 7]
        w1 = g[g["d"] - fd >= 7]
        k0s.append(w0["event_type"].nunique())
        k1s.append(w1["event_type"].nunique())
    row = out.iloc[0]
    assert row["n_users"] == len(k0s)
    assert abs(row["mean_types_week0"] - np.mean(k0s)) < 2e-6
    assert abs(row["mean_types_later"] - np.mean(k1s)) < 2e-6
    assert abs(row["diversification_lift"]
               - sum(k1s) / sum(k0s)) < 2e-6
