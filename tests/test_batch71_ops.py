"""Batch 71: dormant share, partition balance, margin audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dormant_share_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_dormant_share,
    )

    out = t_dormant_share(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
    last = ev.groupby("user_id")["d"].max()
    end = int(last.max())
    age = end - last
    assert out["n_users"].iloc[0] == len(last)
    assert out["dormant_7d"].iloc[0] == int((age >= 7).sum())
    assert out["dormant_14d"].iloc[0] == int((age >= 14).sum())
    assert out["dormant_30d"].iloc[0] == int((age >= 30).sum())
    assert abs(out["share_14d"].iloc[0]
               - int((age >= 14).sum()) / len(last)) < 2e-6
    # rings are nested
    assert out["dormant_7d"].iloc[0] >= out["dormant_14d"].iloc[0] \
        >= out["dormant_30d"].iloc[0]


def test_partition_balance_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_partition_balance,
    )

    out = d_partition_balance(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    M61 = (1 << 61) - 1
    b = [((int(u) * 2654435761 + 12345) % M61) % 64
         for u in ev["user_id"]]
    from collections import Counter
    cnt = Counter(b)
    loads = np.array([cnt.get(i, 0) for i in range(64)], dtype=float)
    assert out["total"].iloc[0] == len(ev)
    assert out["max_load"].iloc[0] == int(loads.max())
    assert out["min_load"].iloc[0] == int(loads.min())
    assert abs(out["imbalance"].iloc[0]
               - loads.max() * 64 / loads.sum()) < 2e-6
    ref_cv = loads.std() / loads.mean()
    assert abs(out["cv"].iloc[0] - ref_cv) < 1e-5
    # a sane hash never exceeds a few x mean at this fill factor
    assert out["imbalance"].iloc[0] < 16.0


def test_margin_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_margin_audit,
    )

    out = q_margin_audit(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(int)
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    g = li.groupby("l_partkey")[["q", "c"]].sum()
    r = dict(zip(pt["p_partkey"],
                 np.floor(pt["p_retailprice"].to_numpy() * 100 + 0.5
                          ).astype(np.int64)))
    below = 0
    ratios = []
    for p, row in g.iterrows():
        rc = int(r[p])
        if int(row["c"]) * 100 < rc * int(row["q"]):
            below += 1
        ratios.append(int(row["c"]) * 100 / (rc * int(row["q"])))
    assert out["n_parts"].iloc[0] == len(g)
    assert out["below_retail"].iloc[0] == below
    assert abs(out["below_share"].iloc[0] - below / len(g)) < 2e-6
    assert abs(out["mean_price_ratio"].iloc[0] - np.mean(ratios)) < 1e-5
