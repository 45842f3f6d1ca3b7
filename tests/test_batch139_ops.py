"""Batch 139: size-price scaling law, discount spend trend,
customer spend consistency."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_size_price_scaling(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_size_price_scaling,
    )

    out = q_size_price_scaling(SF)
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_size", "p_retailprice"])
    x = p["p_size"].to_numpy(float)
    y = np.floor(p["p_retailprice"] * 100 + 0.5).astype(int) \
        .to_numpy(float)
    slope = np.polyfit(x, y, 1)[0]
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_parts"] == len(p)
    assert abs(row["slope_cents_per_size"] - slope) < 1e-3
    assert abs(row["pearson_r"] - r) < 2e-6


def test_discount_spend_trend(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_discount_spend_trend,
    )

    out = q_discount_spend_trend(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["y"] = j["o_orderdate"].dt.year
    cents = np.floor(j["l_extendedprice"] * 100 + 0.5).astype(int)
    dbp = np.floor(j["l_discount"] * 100 + 0.5).astype(int)
    j["g"] = cents * 100
    j["f"] = cents * dbp
    g = j.groupby("y")[["g", "f"]].sum()
    assert list(out["year"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["year"]]
        assert row["gross_units"] == str(int(e["g"]))
        assert row["forgone_units"] == str(int(e["f"]))
        assert abs(row["forgone_share"] - e["f"] / e["g"]) < 2e-6


def test_customer_spend_consistency(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_customer_spend_consistency,
    )

    out = q_customer_spend_consistency(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["c"] = np.floor(od["o_totalprice"] * 100
                       + 0.5).astype(int) // 100
    cvs = []
    for _, g in od.groupby("o_custkey"):
        c = g["c"].to_numpy(float)
        if len(c) < 2 or c.sum() <= 0:
            continue
        cvs.append(np.sqrt(len(c) * (c * c).sum()
                           - c.sum() ** 2) / c.sum())
    cvs = np.array(cvs)
    row = out.iloc[0]
    assert row["n_customers"] == len(cvs)
    assert abs(row["mean_cv"] - cvs.mean()) < 2e-6
    assert abs(row["steady_share"] - (cvs < 0.25).mean()) < 2e-6
