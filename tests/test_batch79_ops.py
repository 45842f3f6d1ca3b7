"""Batch 79: cold-start gap, signup-dow retention, price variance
split."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cold_start_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_cold_start,
    )

    out = t_cold_start(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="stable")
    gaps = []
    single = 0
    for _, g in ev.groupby("user_id"):
        if len(g) < 2:
            single += 1
        else:
            t = g["us"].to_numpy()
            gaps.append((t[1] - t[0]) // 1_000_000)
    gaps = np.sort(np.array(gaps, dtype=np.int64))
    n = len(gaps)
    assert out["n_users_multi"].iloc[0] == n
    assert out["single_event_users"].iloc[0] == single
    assert out["median_gap_s"].iloc[0] == gaps[(n + 1) // 2 - 1]
    assert out["p90_gap_s"].iloc[0] == gaps[(9 * n + 9) // 10 - 1]
    assert abs(out["mean_gap_s"].iloc[0] - gaps.mean()) < 2e-6


def test_signup_dow_retention_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_signup_dow_retention,
    )

    out = t_signup_dow_retention(SF).set_index("dow")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    d = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // 86_400_000_000)
    per = pd.DataFrame({"u": ev["user_id"], "d": d})
    rows = []
    for u, g in per.groupby("u"):
        fd = int(g["d"].min())
        ret = bool(((g["d"] >= fd + 7) & (g["d"] <= fd + 13)).any())
        rows.append(((fd + 4) % 7, ret))
    df = pd.DataFrame(rows, columns=["dow", "ret"])
    base = df["ret"].mean()
    for dow, g in df.groupby("dow"):
        r = out.loc[dow]
        assert r["n_users"] == len(g)
        assert r["retained"] == int(g["ret"].sum())
        assert abs(r["retention_rate"] - g["ret"].mean()) < 2e-6
        assert abs(r["lift"] - g["ret"].mean() / base) < 1e-4
    assert int(out["n_users"].sum()) == per["u"].nunique()


def test_price_variance_split_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_price_variance_split,
    )

    out = q_price_variance_split(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice"])
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    grp = li["l_partkey"].to_numpy()
    gm = c.mean()
    sst = ((c - gm) ** 2).sum()
    ssb = 0.0
    df = pd.DataFrame({"p": grp, "c": c})
    for _, g in df.groupby("p"):
        ssb += len(g) * (g["c"].mean() - gm) ** 2
    eta2 = ssb / sst
    assert out["n_lines"].iloc[0] == len(li)
    assert out["k_parts"].iloc[0] == li["l_partkey"].nunique()
    assert abs(out["eta2_between"].iloc[0] - eta2) < 1e-4
    assert abs(out["within_share"].iloc[0] - (1 - eta2)) < 1e-4
