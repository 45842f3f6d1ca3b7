"""Batch 118: order-value percentile trend, brand return-rate
audit, event-type value profile."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_value_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_value_trend,
    )

    out = q_order_value_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])
    od["y"] = od["o_orderdate"].dt.year
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    years = sorted(od["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        c = np.sort(od.loc[od["y"] == row["year"], "c"].to_numpy())
        n = len(c)
        assert row["n_orders"] == n
        assert row["median_cents"] == c[(n + 1) // 2 - 1]
        assert row["p90_cents"] == c[int(np.ceil(0.9 * n)) - 1]


def test_brand_return_rate_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_return_rate,
    )

    out = q_brand_return_rate(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["r"] = (j["l_returnflag"] == "R").astype(int)
    g = j.groupby("p_brand")["r"].agg(["size", "sum"])
    N, R = len(j), j["r"].sum()
    p = R / N
    assert list(out["brand"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["brand"]]
        assert row["n_lines"] == e["size"]
        assert row["n_returned"] == e["sum"]
        rate = e["sum"] / e["size"]
        assert abs(row["return_rate"] - rate) < 2e-6
        z = (rate - p) / np.sqrt(p * (1 - p) / e["size"])
        assert abs(row["z"] - z) < 2e-5


def test_type_value_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_value_profile,
    )

    out = t_type_value_profile(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("event_type")["c"].agg(["size", "sum"])
    tot = g["sum"].sum()
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_events"] == e["size"]
        assert row["value_cents"] == str(int(e["sum"]))
        assert abs(row["mean_value_cents"]
                   - e["sum"] / e["size"]) < 2e-6
        assert abs(row["value_share"] - e["sum"] / tot) < 2e-6
