"""Batch 141: return hazard curve, cohort entry value, part
lifecycle ladder."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_return_hazard_curve(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_return_hazard_curve,
    )

    out = t_return_hazard_curve(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    cells = ev[["user_id", "d"]].drop_duplicates() \
        .sort_values(["user_id", "d"])
    u = cells["user_id"].to_numpy()
    d = cells["d"].to_numpy()
    same = u[1:] == u[:-1]
    gaps = (d[1:] - d[:-1])[same]
    n = len(gaps)
    assert len(out) == 7
    cum = 0
    for _, row in out.iterrows():
        g = int(row["gap_days"])
        f = int((gaps == g).sum())
        at_risk = n - cum
        assert row["n_returns"] == f
        assert row["n_at_risk"] == at_risk
        if at_risk:
            assert abs(row["hazard"] - f / at_risk) < 2e-6
        else:
            assert row["hazard"] == 0.0
        cum += f


def test_cohort_entry_value(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cohort_entry_value,
    )

    out = q_cohort_entry_value(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    od = od.sort_values(["o_custkey", "o_orderdate",
                         "o_orderkey"])
    first = od.groupby("o_custkey").first()
    first["y"] = pd.DatetimeIndex(first["o_orderdate"]).year
    g = first.groupby("y")["c"].agg(["size", "mean"])
    assert list(out["cohort_year"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["cohort_year"]]
        assert row["n_customers"] == e["size"]
        assert abs(row["mean_first_order_cents"]
                   - e["mean"]) < 2e-6


def test_part_lifecycle(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_part_lifecycle,
    )

    out = q_part_lifecycle(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate"])
    li["d"] = li["l_shipdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    a = li.groupby("l_partkey")["d"].agg(["min", "max"])
    gmax = a["max"].max()
    span = (a["max"] - a["min"]).to_numpy()
    b = np.where(span == 0, -1,
                 np.floor(np.log2(np.maximum(span, 1)
                                  .astype(float))).astype(int))
    g = pd.Series(b).value_counts().sort_index()
    act = int((a["max"] >= gmax - 364).sum())
    assert list(out["bucket_log2"]) == list(g.index)
    for _, row in out.iterrows():
        assert row["n_parts"] == g[int(row["bucket_log2"])]
    assert abs(out.iloc[0]["still_active_share"]
               - act / len(a)) < 2e-6
