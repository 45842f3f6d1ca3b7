"""Batch 137: within-basket price spread, supplier breadth ladder,
second-session latency."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_basket_price_spread(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_basket_price_spread,
    )

    out = q_basket_price_spread(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice"])
    li["c"] = np.floor(li["l_extendedprice"] * 100
                       + 0.5).astype(int) // 100
    cvs = []
    for _, g in li.groupby("l_orderkey"):
        c = g["c"].to_numpy(float)
        if len(c) < 2 or c.sum() <= 0:
            continue
        cvs.append(np.sqrt(len(c) * (c * c).sum()
                           - c.sum() ** 2) / c.sum())
    cvs = np.array(cvs)
    row = out.iloc[0]
    assert row["n_baskets"] == len(cvs)
    assert abs(row["mean_cv"] - cvs.mean()) < 2e-6
    assert abs(row["tight_basket_share"]
               - (cvs < 0.2).mean()) < 2e-6


def test_supplier_breadth_hist(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supplier_breadth_hist,
    )

    out = q_supplier_breadth_hist(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    a = li.groupby("l_suppkey").agg(
        parts=("l_partkey", "nunique"),
        lines=("l_partkey", "size"))
    b = np.floor(np.log2(a["parts"].to_numpy(float))).astype(int)
    g = pd.DataFrame({"b": b, "lines": a["lines"].to_numpy()})
    agg = g.groupby("b").agg(sups=("lines", "size"),
                             lines=("lines", "sum"))
    tot = int(a["lines"].sum())
    assert list(out["bucket_log2"]) == list(agg.index)
    for _, row in out.iterrows():
        e = agg.loc[row["bucket_log2"]]
        assert row["n_suppliers"] == e["sups"]
        assert row["n_lines"] == e["lines"]
        assert abs(row["line_share"] - e["lines"] / tot) < 2e-6


def test_second_session_latency(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_second_session_latency,
    )

    out = t_second_session_latency(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64)
    u = ev["user_id"].to_numpy()
    t = ev["t"].to_numpy()
    new = np.ones(len(ev), bool)
    same = u[1:] == u[:-1]
    new[1:][same & (t[1:] - t[:-1] <= 30 * 60 * 1_000_000)] = \
        False
    st = pd.DataFrame({"u": u[new], "t": t[new]})
    st["rn"] = st.groupby("u").cumcount()
    s1 = st[st["rn"] == 0].set_index("u")["t"]
    s2 = st[st["rn"] == 1].set_index("u")["t"]
    gaps = np.sort(((s2 - s1.reindex(s2.index)) // 1_000_000)
                   .to_numpy())
    n = len(gaps)
    row = out.iloc[0]
    assert row["n_returning_users"] == n
    assert row["n_one_session_users"] == len(s1) - len(s2)
    assert row["median_gap_sec"] == gaps[(n + 1) // 2 - 1]
    assert row["p90_gap_sec"] == gaps[int(np.ceil(0.9 * n)) - 1]
