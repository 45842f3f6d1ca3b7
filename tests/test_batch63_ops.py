"""Batch 63: ship delay, error recovery, casing profile."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ship_delay_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_ship_delay,
    )

    out = q_ship_delay(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    s = m["l_shipdate"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    o = m["o_orderdate"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    gap = np.sort((s - o).to_numpy())
    n = len(gap)
    assert out["n_lines"].iloc[0] == n
    assert out["negative_delays"].iloc[0] == int((gap < 0).sum())
    assert out["median_delay_days"].iloc[0] == gap[(n + 1) // 2 - 1]
    assert out["p90_delay_days"].iloc[0] == gap[(9 * n + 9) // 10 - 1]
    assert abs(out["mean_delay_days"].iloc[0] - gap.mean()) < 2e-6


def test_error_recovery_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_error_recovery,
    )

    out = t_error_recovery(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="stable")
    gaps, unrec = [], 0
    for _u, g in ev.groupby("user_id"):
        t = g["us"].to_numpy()
        et = g["event_type"].to_numpy()
        for i in range(len(g)):
            if et[i] != "error":
                continue
            if i + 1 < len(g):
                gaps.append((t[i + 1] - t[i]) // 1_000_000)
            else:
                unrec += 1
    gaps = np.sort(np.array(gaps))
    n = len(gaps)
    assert out["n_recovered"].iloc[0] == n
    assert out["n_unrecovered"].iloc[0] == unrec
    assert out["median_recovery_sec"].iloc[0] == gaps[(n + 1) // 2 - 1]
    assert out["p90_recovery_sec"].iloc[0] == gaps[(9 * n + 9) // 10 - 1]
    assert abs(out["mean_recovery_sec"].iloc[0] - gaps.mean()) < 2e-6


def test_casing_profile_matches_bruteforce(ray_session):
    import re

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_casing_profile,
    )

    out = d_casing_profile(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    pats = {
        "lower_share": re.compile(r"[a-z]+$"),
        "title_share": re.compile(r"[A-Z][a-z]+$"),
        "caps_share": re.compile(r"[A-Z]{2,}$"),
        "numeric_share": re.compile(r"[0-9]+$"),
    }
    for src, g in docs.groupby("source"):
        toks = [w for t in g["text"] for w in (t or "").split()]
        n = len(toks)
        r = out.loc[src]
        assert r["n_tokens"] == n
        total_share = 0.0
        for col, pat in pats.items():
            cnt = sum(1 for w in toks if pat.fullmatch(w))
            assert abs(r[col] - cnt / n) < 2e-6
            total_share += r[col]
        assert abs(r["other_share"] + total_share - 1.0) < 5e-6
