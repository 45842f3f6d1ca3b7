"""Batch 123: calendar DAU curve, supplier balance-activity
correlation, per-type same-user gap profile."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dau_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_dau_curve,
    )

    out = t_dau_curve(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    g = ev.groupby("d").agg(users=("user_id", "nunique"),
                            events=("user_id", "size"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["day"]]
        assert row["n_users"] == e["users"]
        assert row["n_events"] == e["events"]
        assert abs(row["events_per_user"]
                   - e["events"] / e["users"]) < 2e-6


def test_supplier_balance_activity_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supplier_balance_activity_corr,
    )

    out = q_supplier_balance_activity_corr(SF)
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey"])
    cnt = li.groupby("l_suppkey").size()
    su["x"] = np.floor(su["s_acctbal"] * 100 + 0.5).astype(int)
    su["y"] = su["s_suppkey"].map(cnt).fillna(0).astype(int)
    r = np.corrcoef(su["x"].to_numpy(float),
                    su["y"].to_numpy(float))[0, 1]
    row = out.iloc[0]
    assert row["n_suppliers"] == len(su)
    assert abs(row["balance_activity_r"] - r) < 2e-6


def test_type_gap_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_gap_profile,
    )

    out = t_type_gap_profile(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev["sec"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    ev = ev.sort_values(["user_id", "event_type", "sec",
                         "event_id"])
    u = ev["user_id"].to_numpy()
    et = ev["event_type"].to_numpy(object)
    sec = ev["sec"].to_numpy()
    same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
    gp = pd.DataFrame({"et": et[1:][same],
                       "gap": (sec[1:] - sec[:-1])[same]})
    assert list(out["event_type"]) == sorted(gp["et"].unique())
    for _, row in out.iterrows():
        g = np.sort(gp.loc[gp["et"] == row["event_type"],
                           "gap"].to_numpy())
        n = len(g)
        assert row["n_gaps"] == n
        assert row["median_gap_sec"] == g[(n + 1) // 2 - 1]
        assert abs(row["mean_gap_sec"] - g.mean()) < 2e-6
