"""Batch 68: top-k churn, price stickiness, mantissa KS."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_topk_churn_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_topk_churn,
    )

    out = q_topk_churn(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    us = od["o_orderdate"].astype("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    od["c"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    od["h"] = (us >= mid).to_numpy()

    def top(half):
        g = od[od["h"] == half].groupby("o_custkey")["c"].sum()
        g = g[g > 0]
        return set(sorted(g.index, key=lambda u: (-g[u], u))[:20])

    a, b = top(False), top(True)
    assert out["top_h1"].iloc[0] == len(a)
    assert out["top_h2"].iloc[0] == len(b)
    assert out["stayed"].iloc[0] == len(a & b)
    assert abs(out["jaccard"].iloc[0] - len(a & b) / len(a | b)) < 2e-6


def test_price_stickiness_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_price_stickiness,
    )

    out = q_price_stickiness(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    sticky = 0
    shares = []
    groups = li.groupby("l_partkey")["c"]
    for _p, vals in groups:
        vc = vals.value_counts()
        mx = int(vc.max())
        t = len(vals)
        shares.append(mx / t)
        if 5 * mx >= 4 * t:
            sticky += 1
    assert out["n_parts"].iloc[0] == len(shares)
    assert out["sticky_parts"].iloc[0] == sticky
    assert abs(out["mean_modal_share"].iloc[0] - np.mean(shares)) < 1e-5
    assert 0.0 < out["mean_modal_share"].iloc[0] <= 1.0


def test_mantissa_ks_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_mantissa_ks,
    )

    out = q_mantissa_ks(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice"])
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    lg = np.log10(c)
    m = np.sort(np.floor((lg - np.floor(lg)) * 1e6 + 0.5005) / 1e6)
    n = len(m)
    i = np.arange(1, n + 1)
    d = max(np.abs(i / n - m).max(), np.abs((i - 1) / n - m).max())
    assert out["n"].iloc[0] == n
    assert abs(out["ks_d"].iloc[0] - d) < 1e-5
    # mantissas of real prices are roughly Benford: D well below 0.5
    assert 0.0 <= out["ks_d"].iloc[0] <= 1.0
