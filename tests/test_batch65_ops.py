"""Batch 65: revenue bridge, interval coverage, quiet hours."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def test_revenue_decomposition_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_revenue_decomposition,
    )

    out = q_revenue_decomposition(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice"])
    us = li["l_shipdate"].astype("datetime64[us]").astype(np.int64)
    mid = (int(us.min()) + int(us.max())) // 2
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(int)
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    li["half"] = (us >= mid).astype(int).to_numpy()
    agg = li.groupby(["l_partkey", "half"])[["q", "c"]].sum().unstack(
        fill_value=0)
    q0, q1 = agg[("q", 0)], agg[("q", 1)]
    c0, c1 = agg[("c", 0)], agg[("c", 1)]
    both = (q0 > 0) & (q1 > 0)
    delta = int(c1[both].sum() - c0[both].sum())
    price = int(sum((int(a) * int(b)) // int(d) - int(e)
                    for a, b, d, e in zip(c1[both], q0[both],
                                          q1[both], c0[both])))
    volume = int(sum((int(a) * int(b)) // int(d) - int(e)
                     for a, b, d, e in zip(c0[both], q1[both],
                                           q0[both], c0[both])))
    assert out["delta_cents"].iloc[0] == delta
    assert out["price_effect_cents"].iloc[0] == price
    assert out["volume_effect_cents"].iloc[0] == volume
    # the bridge closes exactly by construction
    assert (out["price_effect_cents"].iloc[0]
            + out["volume_effect_cents"].iloc[0]
            + out["interaction_cents"].iloc[0]) == delta


def test_interval_coverage_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_interval_coverage,
    )

    out = q_interval_coverage(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    li["e"] = li["l_shipdate"].astype("datetime64[us]") \
        .astype(np.int64) // DAY_US
    ship = li.groupby("l_orderkey")["e"].max()
    m = od.merge(ship.rename("e").reset_index(),
                 left_on="o_orderkey", right_on="l_orderkey")
    m["s"] = m["o_orderdate"].astype("datetime64[us]") \
        .astype(np.int64) // DAY_US
    covered = span = merged = 0
    for _u, g in m.groupby("o_custkey"):
        iv = sorted(zip(g["s"], g["e"]))
        cs, ce = iv[0]
        for s, e in iv[1:]:
            if s > ce:
                covered += ce - cs + 1
                merged += 1
                cs, ce = s, e
            else:
                ce = max(ce, e)
        covered += ce - cs + 1
        merged += 1
        span += max(e for _s, e in iv) - min(s for s, _e in iv) + 1
    assert out["n_customers"].iloc[0] == m["o_custkey"].nunique()
    assert out["merged_intervals"].iloc[0] == merged
    assert out["covered_days"].iloc[0] == covered
    assert out["span_days"].iloc[0] == span
    assert abs(out["utilization"].iloc[0] - covered / span) < 2e-6
    assert covered <= span


def test_quiet_hours_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_quiet_hours,
    )

    out = t_quiet_hours(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 3_600_000_000)
    counts = h.value_counts()
    h0, h1 = int(h.min()), int(h.max())
    grid = np.zeros(h1 - h0 + 1, dtype=int)
    grid[counts.index.to_numpy() - h0] = counts.to_numpy()
    silent = int((grid == 0).sum())
    runs = []
    cur = 0
    for v in grid:
        if v == 0:
            cur += 1
        else:
            if cur:
                runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    assert out["n_hours"].iloc[0] == len(grid)
    assert out["silent_hours"].iloc[0] == silent
    assert out["longest_quiet_run"].iloc[0] == (max(runs) if runs else 0)
    assert out["runs_ge_6h"].iloc[0] == sum(1 for r in runs if r >= 6)
    assert abs(out["silent_share"].iloc[0] - silent / len(grid)) < 2e-6
