"""Batch 127: volume-discount curve, sentinel/cap audit, peak-hour
stability."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_volume_discount_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_volume_discount_curve,
    )

    out = q_volume_discount_curve(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    cs = np.sort(od["c"].to_numpy())
    n = len(cs)
    cuts = np.array([cs[int(np.ceil(k * n / 5)) - 1]
                     for k in (1, 2, 3, 4)])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["q"] = np.searchsorted(cuts, j["c"].to_numpy(), "left") + 1
    j["bp"] = np.floor(j["l_discount"] * 100 + 0.5).astype(int)
    g = j.groupby("q")["bp"].agg(["size", "mean"])
    assert list(out["value_quintile"]) == list(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["value_quintile"]]
        assert row["n_lines"] == e["size"]
        assert abs(row["mean_discount_bp"] - e["mean"]) < 2e-6


def test_sentinel_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_sentinel_audit,
    )

    out = q_sentinel_audit(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    scale = {"l_quantity": 1, "l_extendedprice": 100,
             "l_discount": 100, "l_tax": 100}
    assert list(out["column"]) == sorted(scale)
    for _, row in out.iterrows():
        col = row["column"]
        v = np.floor(li[col] * scale[col] + 0.5).astype(int)
        mx = int(v.max())
        assert row["max_units"] == mx
        assert row["n_at_max"] == (v == mx).sum()
        assert abs(row["share_at_max"]
                   - (v == mx).mean()) < 2e-6


def test_peak_hour_stability_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_peak_hour_stability,
    )

    out = t_peak_hour_stability(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    wk = (us // 86_400_000_000) // 7
    hr = (us // 3_600_000_000) % 24
    df = pd.DataFrame({"wk": wk, "hr": hr})
    peaks = {}
    for w, g in df.groupby("wk"):
        c = g["hr"].value_counts()
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        peaks[w] = top[0]
    from collections import Counter
    cnt = Counter(peaks.values())
    modal, mf = sorted(cnt.items(),
                       key=lambda kv: (-kv[1], kv[0]))[0]
    row = out.iloc[0]
    assert row["n_weeks"] == len(peaks)
    assert row["modal_peak_hour"] == modal
    assert row["n_weeks_at_mode"] == mf
    assert abs(row["stability"] - mf / len(peaks)) < 2e-6
