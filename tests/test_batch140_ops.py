"""Batch 140: intraday amplitude, weekend value lift, customer
brand breadth."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_intraday_amplitude(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_intraday_amplitude,
    )

    out = t_intraday_amplitude(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    df = pd.DataFrame({"d": us // 86_400_000_000,
                       "h": (us // 3_600_000_000) % 24})
    facs = []
    for _, g in df.groupby("d"):
        c = g.groupby("h").size()
        facs.append(c.max() * len(c) / c.sum())
    facs = np.array(facs)
    row = out.iloc[0]
    assert row["n_days"] == len(facs)
    assert abs(row["mean_peak_factor"] - facs.mean()) < 2e-6
    assert abs(row["max_peak_factor"] - facs.max()) < 2e-6


def test_weekend_value_lift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_weekend_value_lift,
    )

    out = t_weekend_value_lift(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    d = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    we = ((d + 4) % 7) >= 5
    c = np.floor(ev["value"] * 100 + 0.5).astype(int).to_numpy()
    row = out.iloc[0]
    assert row["n_weekend_events"] == we.sum()
    assert row["n_weekday_events"] == (~we).sum()
    assert abs(row["mean_weekend_cents"] - c[we].mean()) < 2e-6
    assert abs(row["mean_weekday_cents"] - c[~we].mean()) < 2e-6
    assert abs(row["weekend_lift"]
               - c[we].mean() / c[~we].mean()) < 2e-5


def test_customer_brand_breadth(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_customer_brand_breadth,
    )

    out = q_customer_brand_breadth(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    j["rev"] = (np.floor(j["l_extendedprice"] * 100
                         + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    a = j.groupby("o_custkey").agg(
        brands=("p_brand", "nunique"), rev=("rev", "sum"))
    b = np.floor(np.log2(a["brands"].to_numpy(float))).astype(int)
    g = pd.DataFrame({"b": b, "rev": a["rev"].to_numpy()})
    agg = g.groupby("b").agg(custs=("rev", "size"),
                             rev=("rev", "sum"))
    tot = int(a["rev"].sum())
    assert list(out["bucket_log2"]) == list(agg.index)
    for _, row in out.iterrows():
        e = agg.loc[row["bucket_log2"]]
        assert row["n_customers"] == e["custs"]
        assert row["rev_units"] == str(int(e["rev"]))
        assert abs(row["rev_share"] - e["rev"] / tot) < 2e-6
