"""Batch 116: engagement-concentration trend, entry-type retention,
return adverse-selection audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_concentration_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_concentration_trend,
    )

    out = t_concentration_trend(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["m"] = ev["ts"].dt.year * 100 + ev["ts"].dt.month
    g = ev.groupby(["m", "user_id"]).size().reset_index(name="n")
    months = sorted(g["m"].unique())
    assert list(out["month"]) == months
    for _, row in out.iterrows():
        grp = g[g["m"] == row["month"]] \
            .sort_values(["n", "user_id"],
                         ascending=[False, True])
        nu = len(grp)
        k = int(np.ceil(nu / 10))
        assert row["n_users"] == nu
        assert row["n_top_decile"] == k
        assert abs(row["top_decile_share"]
                   - grp["n"].head(k).sum() / grp["n"].sum()) < 2e-6


def test_entry_type_retention_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_entry_type_retention,
    )

    out = t_entry_type_retention(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    first = ev.groupby("user_id").agg(et=("event_type", "first"),
                                      fd=("d", "first"))
    rows = {}
    for u, r in first.iterrows():
        days = ev.loc[ev["user_id"] == u, "d"] - r["fd"]
        ret = int(((days >= 7) & (days <= 13)).any())
        n, s = rows.get(r["et"], (0, 0))
        rows[r["et"]] = (n + 1, s + ret)
    assert list(out["entry_type"]) == sorted(rows)
    for _, row in out.iterrows():
        n, s = rows[row["entry_type"]]
        assert row["n_users"] == n
        assert row["n_retained_week1"] == s
        assert abs(row["week1_retention"] - s / n) < 2e-6


def test_return_value_bias_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_return_value_bias,
    )

    out = q_return_value_bias(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    c = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(int)
    r = (li["l_returnflag"] == "R").to_numpy()
    row = out.iloc[0]
    assert row["n_returned_lines"] == r.sum()
    assert row["n_other_lines"] == (~r).sum()
    assert abs(row["mean_returned_cents"] - c[r].mean()) < 2e-6
    assert abs(row["mean_other_cents"] - c[~r].mean()) < 2e-6
    assert abs(row["return_value_lift"]
               - c[r].mean() / c[~r].mean()) < 2e-5
