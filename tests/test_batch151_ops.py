"""Batch 151: same-day multi-orders, geographic diversification
trend, length-tail correlation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_same_day_orders(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_same_day_orders,
    )

    out = q_same_day_orders(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["d"] = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    c = od.groupby(["o_custkey", "d"]).size()
    multi = c[c >= 2]
    row = out.iloc[0]
    assert row["n_multi_order_days"] == len(multi)
    assert row["n_orders_in_bursts"] == int(multi.sum())
    assert abs(row["burst_order_share"]
               - multi.sum() / len(od)) < 2e-6
    assert row["max_orders_one_day"] == int(c.max())


def test_geo_diversification_trend(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_geo_diversification_trend,
    )

    out = q_geo_diversification_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["y"] = j["o_orderdate"].dt.year
    j["c"] = np.floor(j["o_totalprice"] * 100
                      + 0.5).astype(int) // 100
    g = j.groupby(["y", "c_nationkey"])["c"].sum().reset_index()
    g = g[g["c"] > 0]
    years = sorted(g["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        c = g.loc[g["y"] == row["year"], "c"] \
            .to_numpy(np.float64)
        n = c.sum()
        k = len(c)
        assert row["n_nations"] == k
        if k > 1:
            h = np.log(n) - (c * np.log(c)).sum() / n
            assert abs(row["entropy"] - h) < 2e-6
            assert abs(row["normalized_entropy"]
                       - h / np.log(k)) < 2e-6


def test_length_tail_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_length_tail_corr,
    )

    out = d_length_tail_corr(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "n_chars"])
    from collections import Counter
    tot = Counter()
    per = []
    for _, r in docs.iterrows():
        ws = (r["text"] or "").split()
        if not ws:
            continue
        per.append((r["n_chars"], ws))
        tot.update(ws)
    counts = sorted(tot.values())
    m = counts[(len(counts) + 1) // 2 - 1]
    tail = {w for w, n in tot.items() if n < m}
    x, y = [], []
    for nch, ws in per:
        x.append(nch)
        y.append(sum(1 for w in ws if w in tail) / len(ws))
    r = np.corrcoef(np.array(x, float), np.array(y, float))[0, 1]
    row = out.iloc[0]
    assert row["n_docs"] == len(x)
    assert abs(row["length_tail_r"] - r) < 1e-4
