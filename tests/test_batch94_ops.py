"""Batch 94: TPC-H Q10 returned-item top customers, TPC-H Q6 forecast
revenue change, sessionization-threshold sensitivity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_returned_top_customers_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_returned_top_customers,
    )

    out = q_returned_top_customers(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    r = li[li["l_returnflag"] == "R"].merge(
        od, left_on="l_orderkey", right_on="o_orderkey")
    cents = np.floor(r["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    dbp = np.floor(r["l_discount"].to_numpy() * 100
                   + 0.5).astype(np.int64)
    r = r.assign(rev=[int(c) * (100 - int(d))
                      for c, d in zip(cents, dbp)])
    per = r.groupby("o_custkey").agg(n=("rev", "size"),
                                     rev=("rev", "sum"))
    per = per.sort_values(["rev", "o_custkey"],
                          ascending=[False, True]).head(20)
    assert out["c_custkey"].tolist() == per.index.tolist()
    assert [int(x) for x in out["returned_rev_units"]] == \
        per["rev"].tolist()
    assert out["n_return_lines"].tolist() == per["n"].tolist()
    nk = cu.set_index("c_custkey")["c_nationkey"]
    nm = na.set_index("n_nationkey")["n_name"]
    assert out["n_name"].tolist() == \
        [nm[nk[c]] for c in per.index]


def test_forecast_revenue_change_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_forecast_revenue_change,
    )

    out = q_forecast_revenue_change(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice", "l_discount",
                                  "l_quantity"])
    li = li[li["l_quantity"] < 24]
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    dbp = np.floor(li["l_discount"].to_numpy() * 100
                   + 0.5).astype(np.int64)
    keep = (dbp >= 5) & (dbp <= 7)
    gain = sum(int(c) * int(d) for c, d in
               zip(cents[keep], dbp[keep]))
    row = out.iloc[0]
    assert row["n_lines"] == int(keep.sum())
    assert int(row["revenue_gain_units"]) == gain
    assert abs(row["gain_dollars"] - gain / 1e4) < 2e-6


def test_session_sensitivity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_session_sensitivity,
    )

    out = t_session_sensitivity(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = ev["user_id"].to_numpy(np.int64)
    same = u[1:] == u[:-1]
    gaps = (t[1:] - t[:-1])[same]
    n_users = ev["user_id"].nunique()
    assert out["threshold_min"].tolist() == [5, 15, 30, 60]
    for _, row in out.iterrows():
        th = row["threshold_min"] * 60_000_000
        exp = n_users + int((gaps > th).sum())
        assert row["n_sessions"] == exp
        assert abs(row["sessions_per_user"] - exp / n_users) < 2e-6
    # monotone: larger threshold never creates sessions
    s = out["n_sessions"].tolist()
    assert s == sorted(s, reverse=True)
