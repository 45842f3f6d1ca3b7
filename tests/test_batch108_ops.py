"""Batch 108: token burstiness league, bilateral trade asymmetry,
segment-grain reorder cadence."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_token_burstiness_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_token_burstiness,
    )

    out = d_token_burstiness(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter, defaultdict
    c = Counter()
    dfc = defaultdict(set)
    for _, r in docs.iterrows():
        for w in (r["text"] or "").split():
            c[w] += 1
            dfc[w].add(r["doc_id"])
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(out) == len(exp)
    for i, (tok, n) in enumerate(exp):
        row = out.iloc[i]
        assert row["rank"] == i + 1
        assert row["token"] == tok
        assert row["n_occurrences"] == n
        assert row["n_docs"] == len(dfc[tok])
        assert abs(row["burstiness"] - n / len(dfc[tok])) < 2e-6


def test_trade_asymmetry_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_trade_asymmetry,
    )

    out = q_trade_asymmetry(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    su = pd.read_parquet(f"{SF}/supplier.parquet")
    na = pd.read_parquet(f"{SF}/nation.parquet")
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["s_nationkey"] != j["c_nationkey"]].copy()
    j["rev"] = (np.floor(j["l_extendedprice"] * 100
                         + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    j["a"] = np.minimum(j["s_nationkey"], j["c_nationkey"])
    j["b"] = np.maximum(j["s_nationkey"], j["c_nationkey"])
    j["net"] = np.where(j["s_nationkey"] < j["c_nationkey"],
                        j["rev"], -j["rev"])
    g = j.groupby(["a", "b"]).agg(gross=("rev", "sum"),
                                  net=("net", "sum")).reset_index()
    g = g.sort_values(["gross", "a", "b"],
                      ascending=[False, True, True]).head(10)
    nmap = dict(zip(na["n_nationkey"], na["n_name"]))
    assert len(out) == len(g)
    for i, (_, e) in enumerate(g.iterrows()):
        row = out.iloc[i]
        assert row["nation_a"] == nmap[e["a"]]
        assert row["nation_b"] == nmap[e["b"]]
        assert row["gross_units"] == str(int(e["gross"]))
        assert row["net_units"] == str(int(e["net"]))
        assert abs(row["asymmetry"]
                   - abs(e["net"]) / e["gross"]) < 2e-6


def test_segment_reorder_gap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_segment_reorder_gap,
    )

    out = q_segment_reorder_gap(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    od["d"] = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    od = od.sort_values(["o_custkey", "d"])
    u = od["o_custkey"].to_numpy()
    d = od["d"].to_numpy()
    same = u[1:] == u[:-1]
    gaps = pd.DataFrame({"u": u[1:][same], "gap": (d[1:] - d[:-1])[same]})
    seg = dict(zip(cu["c_custkey"], cu["c_mktsegment"]))
    gaps["seg"] = gaps["u"].map(seg)
    assert len(out) == gaps["seg"].nunique()
    for _, row in out.iterrows():
        gs = np.sort(gaps.loc[gaps["seg"] == row["segment"],
                              "gap"].to_numpy())
        n = len(gs)
        assert row["n_gaps"] == n
        assert row["median_gap_days"] == gs[(n + 1) // 2 - 1]
        assert abs(row["mean_gap_days"] - gs.mean()) < 2e-6
