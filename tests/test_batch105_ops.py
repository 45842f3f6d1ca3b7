"""Batch 105: per-user event-type entropy, TPC-H Q8-style market
share, TwoNN intrinsic-dimension estimate."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_user_type_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_user_type_entropy,
    )

    out = t_user_type_entropy(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    hs, singles = [], 0
    for _, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts().to_numpy(np.float64)
        n = c.sum()
        if len(c) == 1:
            hs.append(0.0)
            singles += 1
        else:
            hs.append(float(np.log(n) - (c * np.log(c)).sum() / n))
    hs = np.sort(np.array(hs))
    n = len(hs)
    row = out.iloc[0]
    assert row["n_users"] == n
    assert abs(row["median_entropy"] - hs[(n + 1) // 2 - 1]) < 2e-6
    assert abs(row["mean_entropy"] - hs.mean()) < 2e-6
    assert abs(row["single_type_share"] - singles / n) < 2e-6


def test_market_share_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_market_share,
    )

    out = q_market_share(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    re = pd.read_parquet(f"{SF}/region.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(na.add_prefix("c"), left_on="c_nationkey",
                right_on="cn_nationkey")
         .merge(re, left_on="cn_regionkey", right_on="r_regionkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(na.add_prefix("s"), left_on="s_nationkey",
                right_on="sn_nationkey"))
    j = j[j["r_name"] == "ASIA"].copy()
    j["yr"] = j["o_orderdate"].dt.year
    j["rev"] = (np.floor(j["l_extendedprice"] * 100 + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    j["rev_t"] = np.where(j["sn_name"] == "NATION_2", j["rev"], 0)
    g = j.groupby("yr").agg(n=("rev", "size"), m=("rev", "sum"),
                            t=("rev_t", "sum"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["order_year"]]
        assert row["n_lines"] == e["n"]
        assert row["market_units"] == str(int(e["m"]))
        assert row["nation_units"] == str(int(e["t"]))
        assert abs(row["share"] - e["t"] / e["m"]) < 2e-6


def test_intrinsic_dim_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_intrinsic_dim,
    )

    out = d_intrinsic_dim(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    ids = em["vec_id"].to_numpy(np.int64)
    nrm = np.linalg.norm(emb, axis=1)
    qidx = np.where(ids < 64)[0]
    terms = []
    n_used = 0
    for qi in qidx:
        sims = emb @ emb[qi] / (nrm * nrm[qi])
        order = sorted(range(len(ids)),
                       key=lambda j: (-sims[j], ids[j]))
        top2 = [j for j in order if ids[j] != ids[qi]][:2]
        d1 = 1.0 - sims[top2[0]]
        d2 = 1.0 - sims[top2[1]]
        if round(d1, 6) <= 0:
            continue
        n_used += 1
        terms.append(np.log(d2 / d1))
    expect = n_used / sum(terms)
    row = out.iloc[0]
    assert row["n_probes"] == len(qidx)
    assert row["n_used"] == n_used
    assert abs(row["intrinsic_dim"] - expect) / expect < 2e-3
