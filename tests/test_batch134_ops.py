"""Batch 134: status value profile, nation balance league, daily
signup curve."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_status_value_profile(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_status_value_profile,
    )

    out = q_status_value_profile(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderstatus", "o_totalprice"])
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    g = od.groupby("o_orderstatus")["c"].agg(["size", "sum"])
    gm = od["c"].sum() / len(od)
    assert list(out["status"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["status"]]
        assert row["n_orders"] == e["size"]
        assert row["value_cents"] == str(int(e["sum"]))
        assert abs(row["mean_value_cents"]
                   - e["sum"] / e["size"]) < 2e-6
        assert abs(row["value_lift"]
                   - (e["sum"] / e["size"]) / gm) < 2e-6


def test_nation_balance_league(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_nation_balance_league,
    )

    out = q_nation_balance_league(SF)
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_nationkey", "c_acctbal"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    cu["c"] = np.floor(cu["c_acctbal"] * 100 + 0.5).astype(int)
    g = cu.groupby("c_nationkey")["c"].agg(["size", "sum"])
    gm = cu["c"].sum() / len(cu)
    nmap = dict(zip(na["n_nationkey"], na["n_name"]))
    assert set(out["n_name"]) == {nmap[k] for k in g.index}
    for _, row in out.iterrows():
        nk = [k for k, v in nmap.items()
              if v == row["n_name"]][0]
        e = g.loc[nk]
        assert row["n_customers"] == e["size"]
        assert abs(row["mean_balance_cents"]
                   - e["sum"] / e["size"]) < 2e-6
        assert abs(row["balance_lift"]
                   - (e["sum"] / e["size"]) / gm) < 2e-6
    lifts = out["balance_lift"].to_numpy()
    assert (lifts[:-1] >= lifts[1:]).all()


def test_signup_curve(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_signup_curve,
    )

    out = t_signup_curve(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    first = ev.groupby("user_id")["d"].min()
    g = first.value_counts().sort_index()
    assert list(out["day"]) == list(g.index)
    cum = 0
    for _, row in out.iterrows():
        assert row["n_new_users"] == g[row["day"]]
        cum += g[row["day"]]
        assert row["cumulative_users"] == cum
