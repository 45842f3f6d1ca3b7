"""Batch 131: realized-vs-list price census, brand HHI trend,
head-vocabulary stability."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_realized_vs_list_price(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_realized_vs_list_price,
    )

    out = q_realized_vs_list_price(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_partkey", "p_retailprice"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rc = np.floor(j["p_retailprice"] * 100 + 0.5).astype(int)
    q = np.floor(j["l_quantity"] + 0.5).astype(int)
    ep = np.floor(j["l_extendedprice"] * 100 + 0.5).astype(int)
    keep = (q > 0) & (rc > 0)
    ratio = ep[keep] / (q[keep] * rc[keep])
    rm = np.floor(ratio * 1e6 + 0.5005).astype(int)
    b = np.minimum(19, rm // 100_000)
    exp = pd.Series(b).value_counts().sort_index()
    assert list(out["band"]) == list(exp.index)
    for _, row in out.iterrows():
        assert row["n_lines"] == exp[int(row["band"])]
    assert abs(out.iloc[0]["mean_ratio"] - ratio.mean()) < 2e-6


def test_brand_hhi_trend(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_hhi_trend,
    )

    out = q_brand_hhi_trend(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    j["y"] = j["o_orderdate"].dt.year
    j["rev"] = (np.floor(j["l_extendedprice"] * 100
                         + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    g = j.groupby(["y", "p_brand"])["rev"].sum().reset_index()
    years = sorted(g["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        s = g.loc[g["y"] == row["year"], "rev"].to_numpy(float)
        hhi = (s ** 2).sum() / s.sum() ** 2
        assert row["n_brands"] == len(s)
        assert abs(row["hhi"] - hhi) < 2e-6


def test_head_token_stability(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_head_token_stability,
    )

    out = d_head_token_stability(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    dmax = docs["doc_id"].max()
    from collections import Counter
    halves = {0: Counter(), 1: Counter()}
    for _, r in docs.iterrows():
        h = int(2 * r["doc_id"] > dmax)
        halves[h].update((r["text"] or "").split())
    tops = {}
    for h in (0, 1):
        exp = sorted(halves[h].items(),
                     key=lambda kv: (-kv[1], kv[0]))[:20]
        tops[h] = {t for t, _ in exp}
    k = min(len(tops[0]), len(tops[1]))
    ov = len(tops[0] & tops[1])
    row = out.iloc[0]
    assert row["top_k"] == k
    assert row["n_overlap"] == ov
    assert abs(row["stability"] - ov / k) < 2e-6
