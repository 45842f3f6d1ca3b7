"""Batch 90: promo revenue share (Q14), Yule's K, large-volume orders
(Q18)."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_promo_revenue_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_promo_revenue,
    )

    out = q_promo_revenue(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = set(pt.loc[pt["p_type"].str.startswith("PROMO"),
                       "p_partkey"])
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    dbp = np.floor(li["l_discount"].to_numpy() * 100
                   + 0.5).astype(np.int64)
    rev = [int(c) * (100 - int(d)) for c, d in zip(cents, dbp)]
    isp = li["l_partkey"].isin(promo).to_numpy()
    m = (li["l_shipdate"].dt.year * 100
         + li["l_shipdate"].dt.month).to_numpy()
    df = pd.DataFrame({"m": m, "rev": rev, "isp": isp})
    assert len(out) == df["m"].nunique()
    for _, row in out.iterrows():
        g = df[df["m"] == row["ship_month"]]
        tot = sum(int(x) for x in g["rev"])
        pr = sum(int(x) for x in g.loc[g["isp"], "rev"])
        assert int(row["rev_units"]) == tot
        assert int(row["promo_units"]) == pr
        assert row["n_lines"] == len(g)
        assert row["promo_lines"] == int(g["isp"].sum())
        assert abs(row["promo_share"] - pr / tot) < 2e-6


def test_yule_k_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_yule_k,
    )

    out = d_yule_k(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    for _, row in out.iterrows():
        texts = docs.loc[docs["source"] == row["source"], "text"]
        from collections import Counter

        cnt = Counter()
        for t in texts.fillna(""):
            cnt.update(t.split())
        n = sum(cnt.values())
        s2 = sum(c * c for c in cnt.values())
        assert row["n_tokens"] == n
        assert row["vocab"] == len(cnt)
        assert abs(row["yule_k"] - 1e4 * (s2 - n) / (n * n)) < 1e-4


def test_big_orders_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_big_orders,
    )

    out = q_big_orders(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    s = li.groupby("l_orderkey")["q"].sum()
    big = s[s >= 200]
    j = od[od["o_orderkey"].isin(big.index)].copy()
    j["total_qty"] = big.loc[j["o_orderkey"]].to_numpy()
    j["total_cents"] = np.floor(j["o_totalprice"].to_numpy() * 100
                                + 0.5).astype(np.int64)
    exp = (j.sort_values(["total_cents", "o_orderkey"],
                         ascending=[False, True]).head(100))
    assert out["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert out["total_qty"].tolist() == exp["total_qty"].tolist()
    assert out["total_cents"].tolist() == exp["total_cents"].tolist()
    assert out["o_custkey"].tolist() == exp["o_custkey"].tolist()
