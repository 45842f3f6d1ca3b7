"""Batch 70: trade flows, props-value correlation, dup locality."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_trade_flows_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_trade_flows,
    )

    out = q_trade_flows(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet",
                         columns=["n_nationkey", "n_name"])
    nmap = dict(zip(na["n_nationkey"], na["n_name"]))
    m = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
    m["rev"] = np.floor(m["l_extendedprice"].to_numpy() * 100 + 0.5
                        ).astype(np.int64)
    m["cn"] = m["c_nationkey"].map(nmap)
    m["sn"] = m["s_nationkey"].map(nmap)
    g = m.groupby(["cn", "sn"])["rev"].sum().reset_index()
    g = g.sort_values(["rev", "cn", "sn"],
                      ascending=[False, True, True]).head(10)
    assert len(out) == 10
    for (_, ref), (_, got) in zip(g.iterrows(), out.iterrows()):
        assert got["cust_nation"] == ref["cn"]
        assert got["supp_nation"] == ref["sn"]
        assert got["rev_cents"] == ref["rev"]


def test_props_value_corr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_props_value_corr,
    )

    out = t_props_value_corr(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "props", "value"])
    k = ev["props"].str.extract(r'"k": (\d+)', expand=False)
    ev = ev[k.notna()].copy()
    ev["k"] = k[k.notna()].astype(int)
    ev["c"] = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    for et, g in ev.groupby("event_type"):
        ref = np.corrcoef(g["k"], g["c"])[0, 1]
        r = out.loc[et]
        assert r["n_parsed"] == len(g)
        assert abs(r["k_value_corr"] - ref) < 2e-6


def test_dup_locality_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_dup_locality,
    )

    out = d_dup_locality(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    docs["h"] = [hashlib.md5((t or "").encode()).hexdigest()
                 for t in docs["text"]]
    gaps = []
    for _h, g in docs.groupby("h"):
        ids = np.sort(g["doc_id"].to_numpy())
        gaps.extend(np.diff(ids).tolist())
    n = len(gaps)
    assert out["n_gap_pairs"].iloc[0] == n
    if n:
        gaps = np.sort(np.array(gaps))
        assert out["median_gap"].iloc[0] == gaps[(n + 1) // 2 - 1]
        adj = int((gaps <= 10).sum())
        assert out["adjacent_pairs"].iloc[0] == adj
        assert abs(out["adjacent_share"].iloc[0] - adj / n) < 2e-6
    else:
        assert out["median_gap"].iloc[0] == 0
        assert out["adjacent_share"].iloc[0] == 0.0
