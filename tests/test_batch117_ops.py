"""Batch 117: spend momentum, discount-by-brand bias, nation-brand
assortment lift."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_spend_momentum_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_spend_momentum,
    )

    out = q_spend_momentum(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["c"] = np.floor(od["o_totalprice"] * 100
                       + 0.5).astype(int) // 100
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    u = od["o_custkey"].to_numpy()
    c = od["c"].to_numpy(float)
    same = u[1:] == u[:-1]
    x, y = c[:-1][same], c[1:][same]
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_pairs"] == len(x)
    assert abs(row["momentum_r"] - r) < 2e-6


def test_discount_by_brand_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_discount_by_brand,
    )

    out = q_discount_by_brand(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_discount"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["bp"] = np.floor(j["l_discount"] * 100 + 0.5).astype(int)
    g = j.groupby("p_brand")["bp"].agg(["size", "mean", "max"])
    assert list(out["brand"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["brand"]]
        assert row["n_lines"] == e["size"]
        assert abs(row["mean_discount_bp"] - e["mean"]) < 2e-6
        assert row["max_discount_bp"] == e["max"]


def test_nation_brand_lift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_nation_brand_lift,
    )

    out = q_nation_brand_lift(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    g = j.groupby(["c_nationkey", "p_brand"]).size() \
        .reset_index(name="c")
    N = g["c"].sum()
    row_t = g.groupby("c_nationkey")["c"].sum()
    col_t = g.groupby("p_brand")["c"].sum()
    nmap = dict(zip(na["n_nationkey"], na["n_name"]))
    cand = []
    for _, r in g.iterrows():
        if r["c"] < 50:
            continue
        lift = r["c"] * N / (row_t[r["c_nationkey"]]
                             * col_t[r["p_brand"]])
        cand.append((nmap[r["c_nationkey"]], r["p_brand"],
                     int(r["c"]), lift))
    cand.sort(key=lambda x: (-round(x[3], 6), x[0], x[1]))
    cand = cand[:10]
    assert len(out) == len(cand)
    for i, (nn, br, c, lift) in enumerate(cand):
        row = out.iloc[i]
        assert row["n_name"] == nn
        assert row["brand"] == br
        assert row["n_lines"] == c
        assert abs(row["lift"] - lift) < 2e-6
