"""Batch 154: session-entry census, domestic preference, supplier
return-rate league."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_session_entry_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_session_entry_census,
    )

    out = t_session_entry_census(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev["user_id"].to_numpy()
    t = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    et = ev["event_type"].to_numpy(object)
    first = np.ones(len(ev), bool)
    same = u[1:] == u[:-1]
    first[1:][same & (t[1:] - t[:-1]
                      <= 30 * 60 * 1_000_000)] = False
    df = pd.DataFrame({"et": et, "starts": first.astype(int)})
    g = df.groupby("et")["starts"].agg(["size", "sum"])
    S, N = df["starts"].sum(), len(df)
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_events"] == e["size"]
        assert row["n_session_starts"] == e["sum"]
        assert abs(row["entry_share"] - e["sum"] / S) < 2e-6
        assert abs(row["entry_lift"]
                   - (e["sum"] / e["size"]) / (S / N)) < 2e-5


def test_domestic_preference(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_domestic_preference,
    )

    out = q_domestic_preference(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
    j["dom"] = (j["c_nationkey"] == j["s_nationkey"]).astype(int)
    a = j.groupby("o_custkey")["dom"].agg(["size", "sum"])
    a = a[a["size"] >= 20]
    sh = a["sum"] / a["size"]
    row = out.iloc[0]
    assert row["n_customers"] == len(a)
    assert abs(row["mean_domestic_share"] - sh.mean()) < 2e-6
    assert abs(row["strongly_domestic_share"]
               - (sh > 0.5).mean()) < 2e-6


def test_supplier_return_rate(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supplier_return_rate,
    )

    out = q_supplier_return_rate(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_returnflag"])
    li["r"] = (li["l_returnflag"] == "R").astype(int)
    g = li.groupby("l_suppkey")["r"].agg(["size", "sum"])
    N, R = len(li), li["r"].sum()
    p = R / N
    g = g[g["size"] >= 100]
    cand = []
    for s, e in g.iterrows():
        rate = e["sum"] / e["size"]
        z = (rate - p) / np.sqrt(p * (1 - p) / e["size"])
        cand.append((round(z, 6), s, e["size"], rate))
    cand.sort(key=lambda x: (-x[0], x[1]))
    cand = cand[:10]
    assert len(out) == len(cand)
    for i, (z, s, n, rate) in enumerate(cand):
        row = out.iloc[i]
        assert row["s_suppkey"] == s
        assert row["n_lines"] == n
        assert abs(row["return_rate"] - rate) < 2e-6
        assert abs(row["z"] - z) < 2e-5
