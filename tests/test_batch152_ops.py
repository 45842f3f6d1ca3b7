"""Batch 152: return-delay link, return-discount link, per-type
peak hour."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_return_delay_link(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_return_delay_link,
    )

    out = q_return_delay_link(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate",
                                  "l_returnflag"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["d"] = (j["l_shipdate"].values.astype("datetime64[D]")
              .astype(np.int64)
              - j["o_orderdate"].values.astype("datetime64[D]")
              .astype(np.int64))
    r = (j["l_returnflag"] == "R").to_numpy()
    row = out.iloc[0]
    assert row["n_returned"] == r.sum()
    assert row["n_kept"] == (~r).sum()
    assert abs(row["mean_delay_returned"]
               - j.loc[r, "d"].mean()) < 2e-6
    assert abs(row["mean_delay_kept"]
               - j.loc[~r, "d"].mean()) < 2e-6


def test_return_discount_link(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_return_discount_link,
    )

    out = q_return_discount_link(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_discount"])
    bp = np.floor(li["l_discount"] * 100 + 0.5).astype(int)
    r = (li["l_returnflag"] == "R").to_numpy()
    row = out.iloc[0]
    assert row["n_returned"] == r.sum()
    assert abs(row["mean_bp_returned"] - bp[r].mean()) < 2e-6
    assert abs(row["mean_bp_kept"] - bp[~r].mean()) < 2e-6
    assert abs(row["discount_lift"]
               - bp[r].mean() / bp[~r].mean()) < 2e-5


def test_type_peak_hour(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_peak_hour,
    )

    out = t_type_peak_hour(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    ev["hr"] = (ev["ts"].values.astype("datetime64[us]")
                .astype(np.int64) // 3_600_000_000) % 24
    assert list(out["event_type"]) == \
        sorted(ev["event_type"].unique())
    for _, row in out.iterrows():
        g = ev.loc[ev["event_type"] == row["event_type"], "hr"]
        vc = g.value_counts()
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert row["n_events"] == len(g)
        assert row["peak_hour"] == top[0]
        assert abs(row["peak_share"] - top[1] / len(g)) < 2e-6
