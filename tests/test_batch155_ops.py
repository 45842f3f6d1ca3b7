"""Batch 155: part-level inflation, first-brand anchoring, peak
reach."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_part_inflation(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_part_inflation,
    )

    out = q_part_inflation(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity",
                                  "l_extendedprice"])
    li["y"] = li["l_shipdate"].dt.year
    li["q"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    li["c"] = np.floor(li["l_extendedprice"] * 100
                       + 0.5).astype(int)
    y0, y1 = li["y"].min(), li["y"].max()
    a = li.groupby(["l_partkey", "y"])[["q", "c"]].sum()
    ratios, ups = [], 0
    for p in li["l_partkey"].unique():
        if (p, y0) not in a.index or (p, y1) not in a.index:
            continue
        q0, c0 = a.loc[(p, y0)]
        q1, c1 = a.loc[(p, y1)]
        if q0 == 0 or q1 == 0 or c0 == 0:
            continue
        ratios.append((c1 * q0) / (c0 * q1))
        ups += int(c1 * q0 > c0 * q1)
    r = np.sort(np.array(ratios))
    n = len(r)
    row = out.iloc[0]
    assert row["n_parts"] == n
    assert abs(row["median_price_ratio"]
               - r[(n + 1) // 2 - 1]) < 2e-6
    assert abs(row["inflating_share"] - ups / n) < 2e-6
    assert abs(row["max_ratio"] - r[-1]) < 2e-6
    assert abs(row["min_ratio"] - r[0]) < 2e-6


def test_first_brand_anchor(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_first_brand_anchor,
    )

    out = q_first_brand_anchor(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_linenumber"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    j = j.sort_values(["o_custkey", "o_orderdate", "l_orderkey",
                       "l_linenumber", "p_brand"])
    n = anch = 0
    for u, g in j.groupby("o_custkey"):
        if g["l_orderkey"].nunique() < 2:
            continue
        n += 1
        first = g["p_brand"].iloc[0]
        vc = g["p_brand"].value_counts()
        modal = sorted(vc.items(),
                       key=lambda kv: (-kv[1], kv[0]))[0][0]
        anch += int(first == modal)
    row = out.iloc[0]
    assert row["n_customers"] == n
    assert row["n_anchored"] == anch
    assert abs(row["anchor_rate"] - anch / n) < 2e-6


def test_peak_reach(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_peak_reach,
    )

    out = t_peak_reach(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["hr"] = (ev["ts"].values.astype("datetime64[us]")
                .astype(np.int64) // 3_600_000_000) % 24
    c = ev.groupby("hr").size()
    peak = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    reach = ev.loc[ev["hr"] == peak, "user_id"].nunique()
    total = ev["user_id"].nunique()
    row = out.iloc[0]
    assert row["peak_hour"] == peak
    assert row["n_users_in_peak"] == reach
    assert row["n_users_total"] == total
    assert abs(row["peak_reach"] - reach / total) < 2e-6
