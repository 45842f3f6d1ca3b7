"""Batch 146: yearly largest order, type weekend affinity,
supplier discount exposure."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_yearly_largest_order(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_yearly_largest_order,
    )

    out = q_yearly_largest_order(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["y"] = od["o_orderdate"].dt.year
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    od = od.sort_values(["y", "c", "o_orderkey"],
                        ascending=[True, False, True])
    top = od.groupby("y").first()
    assert list(out["year"]) == list(top.index)
    for _, row in out.iterrows():
        e = top.loc[row["year"]]
        assert row["o_orderkey"] == e["o_orderkey"]
        assert row["o_custkey"] == e["o_custkey"]
        assert row["value_cents"] == e["c"]


def test_type_weekend_affinity(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_weekend_affinity,
    )

    out = t_type_weekend_affinity(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    d = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ev["we"] = (((d + 4) % 7) >= 5).astype(int)
    g = ev.groupby("event_type")["we"].agg(["size", "sum"])
    W, N = ev["we"].sum(), len(ev)
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_events"] == e["size"]
        assert abs(row["weekend_share"]
                   - e["sum"] / e["size"]) < 2e-6
        assert abs(row["weekend_lift"]
                   - (e["sum"] / e["size"]) / (W / N)) < 2e-5


def test_supplier_discount_exposure(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supplier_discount_exposure,
    )

    out = q_supplier_discount_exposure(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    c = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(int)
    bp = np.floor(li["l_discount"] * 100 + 0.5).astype(int)
    df = pd.DataFrame({"s": li["l_suppkey"], "c": c, "w": c * bp})
    g = df.groupby("s")[["c", "w"]].sum()
    g["wbp"] = (g["w"] / g["c"]).round(6)
    cand = sorted(((m, s) for s, m in g["wbp"].items()),
                  key=lambda x: (-x[0], x[1]))[:10]
    assert len(out) == len(cand)
    for i, (m, s) in enumerate(cand):
        row = out.iloc[i]
        assert row["s_suppkey"] == s
        assert abs(row["weighted_discount_bp"] - m) < 2e-6
