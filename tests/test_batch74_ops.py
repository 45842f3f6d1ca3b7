"""Batch 74: order reconciliation, hour-of-day Brown-Forsythe,
linenumber contiguity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_reconcile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_reconcile,
    )

    out = q_order_reconcile(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(object)
    d = np.floor(li["l_discount"].to_numpy() * 100 + 0.5).astype(int)
    t = np.floor(li["l_tax"].to_numpy() * 100 + 0.5).astype(int)
    li["chg"] = c * (100 - d) * (100 + t)
    per = li.groupby("l_orderkey")["chg"].sum()
    hc = pd.Series(
        (np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5)
         .astype(object) * 10000),
        index=od["o_orderkey"].to_numpy())
    joined = per.index.intersection(hc.index)
    gap = (per.loc[joined] - hc.loc[joined]).astype(object)
    absgap = gap.abs()
    assert out["n_orders"].iloc[0] == len(joined)
    assert out["matched"].iloc[0] == int((gap == 0).sum())
    assert out["over"].iloc[0] == int((gap > 0).sum())
    assert out["under"].iloc[0] == int((gap < 0).sum())
    assert abs(out["mean_abs_gap"].iloc[0]
               - float(absgap.sum()) / (len(joined) * 1e6)) < 2e-6
    assert abs(out["max_abs_gap"].iloc[0]
               - float(absgap.max()) / 1e6) < 2e-6
    # counts partition
    assert (out["matched"] + out["over"] + out["under"]).iloc[0] \
        == out["n_orders"].iloc[0]


def test_hour_levene_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_hour_levene,
    )

    out = t_hour_levene(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    h = (us // 3_600_000_000) % 24
    v = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    zs, groups = [], []
    best = None
    for hour in range(24):
        x = np.sort(v[h == hour])
        n_h = len(x)
        m2 = int(x[(n_h + 1) // 2 - 1]) + int(x[n_h // 2])
        z = np.abs(2 * x - m2).astype(np.float64)
        zs.append(z)
        groups.append(np.full(n_h, hour))
        mq = int(np.floor(z.mean() / 2.0 * 1e6 + 0.5005))
        if best is None or mq > best[1]:
            best = (hour, mq)
    z = np.concatenate(zs)
    grp = np.concatenate(groups)
    N, k = len(z), 24
    gm = z.mean()
    ssb = sum((z[grp == i].mean() - gm) ** 2 * (grp == i).sum()
              for i in range(24))
    ssw = sum(((z[grp == i] - z[grp == i].mean()) ** 2).sum()
              for i in range(24))
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["k"].iloc[0] == k
    assert out["n"].iloc[0] == N
    assert abs(out["f_stat"].iloc[0] - f) < 1e-4
    assert out["top_hour"].iloc[0] == best[0]
    assert abs(out["top_mad_cents"].iloc[0] - best[1] / 1e6) < 1e-9


def test_linenumber_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_linenumber_audit,
    )

    out = q_linenumber_audit(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    n_ok = n_dup = n_gap = 0
    for _, g in li.groupby("l_orderkey"):
        ln = g["l_linenumber"].to_numpy()
        if len(ln) > len(set(ln)):
            n_dup += 1
        elif sorted(ln) == list(range(1, len(ln) + 1)):
            n_ok += 1
        else:
            n_gap += 1
    tot = n_ok + n_dup + n_gap
    assert out["n_orders"].iloc[0] == tot
    assert out["contiguous"].iloc[0] == n_ok
    assert out["dup_line_orders"].iloc[0] == n_dup
    assert out["gap_orders"].iloc[0] == n_gap
    assert out["max_linenumber"].iloc[0] == int(li["l_linenumber"].max())
    assert abs(out["violation_share"].iloc[0]
               - (n_dup + n_gap) / tot) < 2e-6
