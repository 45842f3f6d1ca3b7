"""Batch 133: order size-delay correlation, calendar user mix,
within-session value curve."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_size_delay_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_size_delay_corr,
    )

    out = q_size_delay_corr(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["d"] = (j["l_shipdate"].values.astype("datetime64[D]")
              .astype(np.int64)
              - j["o_orderdate"].values.astype("datetime64[D]")
              .astype(np.int64))
    g = j.groupby("l_orderkey")["d"].agg(["size", "mean"])
    r = np.corrcoef(g["size"].to_numpy(float),
                    g["mean"].to_numpy(float))[0, 1]
    row = out.iloc[0]
    assert row["n_orders"] == len(g)
    assert abs(row["size_delay_r"] - r) < 1e-4


def test_calendar_user_mix(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_calendar_user_mix,
    )

    out = t_calendar_user_mix(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    d = ev["ts"].values.astype("datetime64[D]").astype(np.int64)
    ev["we"] = ((d + 4) % 7) >= 5
    g = ev.groupby("user_id")["we"].agg(["max", "min"])
    both = int((g["max"] & ~g["min"]).sum())
    we_only = int((g["max"] & g["min"]).sum())
    wd_only = int((~g["max"]).sum())
    row = out.iloc[0]
    assert row["n_users"] == len(g)
    assert row["n_both"] == both
    assert row["n_weekend_only"] == we_only
    assert row["n_weekday_only"] == wd_only


def test_session_position_value(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_session_position_value,
    )

    out = t_session_position_value(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64)
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    u = ev["user_id"].to_numpy()
    t = ev["t"].to_numpy()
    new = np.ones(len(ev), dtype=int)
    same = u[1:] == u[:-1]
    new[1:][same & (t[1:] - t[:-1] <= 30 * 60 * 1_000_000)] = 0
    ev["sid"] = np.cumsum(new)
    ev["pos"] = ev.groupby("sid").cumcount() + 1
    sub = ev[ev["pos"] <= 10]
    g = sub.groupby("pos")["c"].agg(["size", "mean"])
    assert list(out["position"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["position"]]
        assert row["n_events"] == e["size"]
        assert abs(row["mean_value_cents"] - e["mean"]) < 2e-6
