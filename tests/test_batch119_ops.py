"""Batch 119: segment revenue-mix trend, brand growth league,
id-time concordance audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_segment_mix_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_segment_mix_trend,
    )

    out = q_segment_mix_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    j = od.merge(cu, left_on="o_custkey", right_on="c_custkey")
    j["y"] = j["o_orderdate"].dt.year
    j["c"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    g = j.groupby(["y", "c_mktsegment"]).agg(
        n=("c", "size"), s=("c", "sum")).reset_index()
    ytot = j.groupby("y")["c"].sum()
    g = g.sort_values(["y", "c_mktsegment"]).reset_index(drop=True)
    assert len(out) == len(g)
    for i, (_, e) in enumerate(g.iterrows()):
        row = out.iloc[i]
        assert row["year"] == e["y"]
        assert row["segment"] == e["c_mktsegment"]
        assert row["n_orders"] == e["n"]
        assert row["revenue_cents"] == str(int(e["s"]))
        assert abs(row["rev_share"]
                   - e["s"] / ytot[e["y"]]) < 2e-6


def test_brand_growth_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_growth,
    )

    out = q_brand_growth(SF)
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
    y0, y1 = j["y"].min(), j["y"].max()
    g = j.groupby(["p_brand", "y"])["rev"].sum()
    brands = sorted(j["p_brand"].unique())
    assert list(out["brand"]) == brands
    for _, row in out.iterrows():
        a = int(g.get((row["brand"], y0), 0))
        b = int(g.get((row["brand"], y1), 0))
        assert row["first_year_units"] == str(a)
        assert row["last_year_units"] == str(b)
        if a:
            assert abs(row["growth_ratio"] - b / a) < 2e-6
        else:
            assert row["growth_ratio"] == 0.0


def test_id_time_concordance_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_id_time_concordance,
    )

    out = t_id_time_concordance(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_id"])
    ev["t"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64)
    ev = ev.sort_values(["t", "event_id"])
    e = ev["event_id"].to_numpy()
    row = out.iloc[0]
    assert row["n_pairs"] == len(e) - 1
    assert row["n_concordant"] == (e[1:] > e[:-1]).sum()
    assert abs(row["concordance"]
               - (e[1:] > e[:-1]).mean()) < 2e-6
