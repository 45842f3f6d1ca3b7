"""Batch 148: supply-demand co-location, delay seasonality,
tenure value mix."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_supply_demand_colocation(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supply_demand_colocation,
    )

    out = q_supply_demand_colocation(SF)
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet",
                         columns=["n_nationkey"])
    cg = cu["c_nationkey"].value_counts()
    sg = su["s_nationkey"].value_counts()
    keys = sorted(na["n_nationkey"])
    x = np.array([sg.get(k, 0) for k in keys], float)
    y = np.array([cg.get(k, 0) for k in keys], float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_nations"] == len(keys)
    assert abs(row["colocation_r"] - r) < 2e-6


def test_delay_seasonality(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_delay_seasonality,
    )

    out = q_delay_seasonality(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["m"] = j["l_shipdate"].dt.month
    j["d"] = (j["l_shipdate"].values.astype("datetime64[D]")
              .astype(np.int64)
              - j["o_orderdate"].values.astype("datetime64[D]")
              .astype(np.int64))
    g = j.groupby("m")["d"].agg(["size", "mean"])
    assert list(out["ship_month"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["ship_month"]]
        assert row["n_lines"] == e["size"]
        assert abs(row["mean_delay_days"] - e["mean"]) < 2e-6


def test_tenure_value_mix(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_tenure_value_mix,
    )

    out = t_tenure_value_mix(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    first = ev.groupby("user_id")["d"].transform("min")
    w0 = (ev["d"] - first) < 7
    tot = ev["c"].sum()
    row = out.iloc[0]
    assert row["n_week1_events"] == w0.sum()
    assert row["n_veteran_events"] == (~w0).sum()
    assert abs(row["week1_value_share"]
               - ev.loc[w0, "c"].sum() / tot) < 2e-6
    assert abs(row["veteran_value_share"]
               - ev.loc[~w0, "c"].sum() / tot) < 2e-6
