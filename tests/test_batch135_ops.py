"""Batch 135: churn precursor, binge index, TPC-H Q15 top
supplier with tie semantics."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_churn_precursor(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_churn_precursor,
    )

    out = t_churn_precursor(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    dmax = ev["d"].max()
    pen = ev[(ev["d"] > dmax - 14) & (ev["d"] <= dmax - 7)] \
        .groupby("user_id").size()
    last = ev[ev["d"] > dmax - 7].groupby("user_id").size()
    churn = [u for u in pen.index if u not in last.index]
    ret = [u for u in pen.index if u in last.index]
    row = out.iloc[0]
    assert row["n_churned"] == len(churn)
    assert row["n_retained"] == len(ret)
    if churn:
        assert abs(row["mean_penultimate_events_churned"]
                   - pen[churn].mean()) < 2e-6
    if ret:
        assert abs(row["mean_penultimate_events_retained"]
                   - pen[ret].mean()) < 2e-6


def test_binge_index(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_binge_index,
    )

    out = t_binge_index(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    shares, singles = [], 0
    for _, g in ev.groupby("user_id"):
        c = g.groupby("d").size()
        if len(c) == 1:
            shares.append(1.0)
            singles += 1
        else:
            shares.append(c.max() / c.sum())
    row = out.iloc[0]
    assert row["n_users"] == len(shares)
    assert abs(row["mean_binge_share"] - np.mean(shares)) < 2e-6
    assert abs(row["one_sitting_share"]
               - singles / len(shares)) < 2e-6


def test_top_supplier(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_top_supplier,
    )

    out = q_top_supplier(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
            & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))]
    li["rev"] = (np.floor(li["l_extendedprice"] * 100
                          + 0.5).astype(int)
                 * (100 - np.floor(li["l_discount"] * 100
                                   + 0.5).astype(int)))
    per = li.groupby("l_suppkey")["rev"].sum()
    mx = per.max()
    winners = sorted(per[per == mx].index)
    assert list(out["s_suppkey"]) == winners
    assert (out["revenue_units"] == str(int(mx))).all()
