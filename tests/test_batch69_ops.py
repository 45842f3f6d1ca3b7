"""Batch 69: psych pricing, priority mix drift, discount ladder."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_psych_pricing_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_psych_pricing,
    )

    out = q_psych_pricing(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice"])
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5
                 ).astype(np.int64)
    r = c % 100
    n = len(c)
    k = int(np.isin(r, [0, 95, 99]).sum())
    assert out["n"].iloc[0] == n
    assert out["charm_count"].iloc[0] == k
    assert abs(out["charm_share"].iloc[0] - k / n) < 2e-6
    p = 0.03
    ref_z = (k - n * p) / np.sqrt(n * p * (1 - p))
    assert abs(out["z_vs_uniform"].iloc[0] - ref_z) < 1e-4


def test_priority_mix_drift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_priority_mix_drift,
    )

    out = t_priority_mix_drift(SF).set_index("ym")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate", "o_orderpriority"])
    ts = od["o_orderdate"]
    od["ym"] = ts.dt.year * 100 + ts.dt.month
    pri = sorted(od["o_orderpriority"].unique())
    glob = od["o_orderpriority"].value_counts()
    na = len(od)
    for ym, g in od.groupby("ym"):
        vc = g["o_orderpriority"].value_counts()
        nm = len(g)
        psi = 0.0
        for p in pri:
            pm = max(vc.get(p, 0) / nm, 1e-6)
            pg = max(glob[p] / na, 1e-6)
            psi += (pm - pg) * np.log(pm / pg)
        r = out.loc[ym]
        assert r["n_orders"] == nm
        assert abs(r["psi"] - psi) < 1e-5
        assert r["psi"] >= -1e-9  # PSI is nonnegative


def test_discount_ladder_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_discount_ladder,
    )

    out = q_discount_ladder(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_discount", "l_quantity"])
    li["d"] = np.floor(li["l_discount"].to_numpy() * 100 + 0.5
                       ).astype(int)
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(int)
    g = li.groupby("d")["q"].agg(["count", "sum", "mean"]).sort_index()
    assert len(out) == len(g)
    for (d, row), (_, orow) in zip(g.iterrows(), out.iterrows()):
        assert orow["discount_pct"] == d
        assert orow["n"] == row["count"]
        assert abs(orow["mean_quantity"] - row["mean"]) < 2e-6
    means = g["mean"].to_numpy()
    inv = int((means[1:] < means[:-1]).sum())
    assert (out["ladder_inversions"] == inv).all()
