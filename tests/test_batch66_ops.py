"""Batch 66: HHI trend, tail dependence, month-end load."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hhi_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_hhi_trend,
    )

    out = t_hhi_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    od["w"] = od["o_orderdate"].astype("datetime64[us]") \
        .astype(np.int64) // 604_800_000_000
    od["rev"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                         ).astype(np.int64)
    hhis = {}
    for w, g in od.groupby("w"):
        per = g.groupby("o_custkey")["rev"].sum().to_numpy(float)
        hhis[int(w)] = (per ** 2).sum() / per.sum() ** 2
    got = out.set_index("week")
    for w, h in hhis.items():
        assert abs(got.loc[w, "hhi"] - h) < 2e-6
    # slope: OLS over (week - min, hhi)
    ws = np.array(sorted(hhis), dtype=float)
    x = ws - ws.min()
    y = np.array([round(hhis[int(w)] * 1e6) for w in ws], dtype=float)
    n = len(x)
    slope = ((n * (x * y).sum() - x.sum() * y.sum())
             / (n * (x * x).sum() - x.sum() ** 2)) / 1e6
    assert abs(out["slope_per_week"].iloc[0] - slope) < 1e-5


def test_tail_dependence_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_tail_dependence,
    )

    out = q_tail_dependence(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    x = np.sort(np.floor(li["l_quantity"].to_numpy() + 0.5)
                .astype(np.int64))
    y = np.sort(np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
                .astype(np.int64))
    n = len(x)
    x90 = x[(9 * n + 9) // 10 - 1]
    y90 = y[(9 * n + 9) // 10 - 1]
    xv = np.floor(li["l_quantity"].to_numpy() + 0.5)
    yv = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    joint = int(((xv > x90) & (yv > y90)).sum())
    ytail = int((yv > y90).sum())
    assert out["x90"].iloc[0] == x90
    assert out["y90"].iloc[0] == y90
    assert out["joint_exceed"].iloc[0] == joint
    assert out["y_exceed"].iloc[0] == ytail
    assert abs(out["tail_lambda"].iloc[0] - joint / ytail) < 2e-6
    assert 0.0 <= out["tail_lambda"].iloc[0] <= 1.0


def test_month_end_load_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_month_end_load,
    )

    out = q_month_end_load(SF).set_index("ym")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])
    ts = od["o_orderdate"]
    od["ym"] = ts.dt.year * 100 + ts.dt.month
    od["c"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    od["last3"] = (ts.dt.days_in_month - ts.dt.day) < 3
    for ym, g in od.groupby("ym"):
        tot = int(g["c"].sum())
        l3 = int(g.loc[g["last3"], "c"].sum())
        r = out.loc[ym]
        assert r["total_cents"] == tot
        assert r["last3_cents"] == l3
        assert abs(r["share_last3"] - l3 / tot) < 2e-6
