"""Batch 142: type streaks, bulk pricing curve, post-type gap
profile."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_type_streaks(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_streaks,
    )

    out = t_type_streaks(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev["user_id"].to_numpy()
    et = ev["event_type"].to_numpy(object)
    new = np.ones(len(ev), bool)
    new[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
    rid = np.cumsum(new)
    runs = pd.DataFrame({"rid": rid, "et": et}) \
        .groupby("rid").agg(et=("et", "first"),
                            ln=("et", "size"))
    g = runs.groupby("et")["ln"].agg(["size", "mean", "max"])
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_runs"] == e["size"]
        assert abs(row["mean_run_length"] - e["mean"]) < 2e-6
        assert row["max_run_length"] == e["max"]


def test_bulk_pricing_curve(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_bulk_pricing_curve,
    )

    out = q_bulk_pricing_curve(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    q = np.floor(li["l_quantity"] + 0.5).astype(int)
    c = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(int)
    keep = q > 0
    df = pd.DataFrame({"b": (q[keep] - 1) // 10,
                       "q": q[keep], "c": c[keep]})
    g = df.groupby("b").agg(n=("q", "size"), q=("q", "sum"),
                            c=("c", "sum"))
    assert list(out["quantity_band"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["quantity_band"]]
        assert row["n_lines"] == e["n"]
        assert row["total_quantity"] == e["q"]
        assert abs(row["unit_price_cents"] - e["c"] / e["q"]) \
            < 2e-6


def test_post_type_gap(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_post_type_gap,
    )

    out = t_post_type_gap(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev["user_id"].to_numpy()
    sec = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    et = ev["event_type"].to_numpy(object)
    same = u[1:] == u[:-1]
    gp = pd.DataFrame({"et": et[:-1][same],
                       "g": (sec[1:] - sec[:-1])[same]})
    g = gp.groupby("et")["g"].agg(["size", "mean"])
    gm = gp["g"].mean()
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_gaps"] == e["size"]
        assert abs(row["mean_next_gap_sec"] - e["mean"]) < 2e-6
        assert abs(row["gap_lift"] - e["mean"] / gm) < 2e-5
