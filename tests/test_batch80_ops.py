"""Batch 80: gap lag-1 autocorrelation, brand-breadth census,
embedding anisotropy."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_gap_autocorr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_gap_autocorr,
    )

    out = t_gap_autocorr(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="stable")
    xs, ys = [], []
    for _, g in ev.groupby("user_id"):
        t = g["us"].to_numpy()
        if len(t) < 3:
            continue
        gaps = (t[1:] - t[:-1]) // 1_000_000
        xs.append(gaps[:-1])
        ys.append(gaps[1:])
    x = np.concatenate(xs).astype(np.float64)
    y = np.concatenate(ys).astype(np.float64)
    assert out["n_pairs"].iloc[0] == len(x)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(out["corr"].iloc[0] - r) < 2e-6


def test_brand_loyalty_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_loyalty,
    )

    out = q_brand_loyalty(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
          .merge(pt, left_on="l_partkey", right_on="p_partkey")
    k = j.groupby("o_custkey")["p_brand"].nunique()
    vc = k.value_counts().sort_index()
    tot = len(k)
    assert list(out["brand_cnt"]) == list(vc.index)
    assert list(out["n_customers"]) == list(vc.to_numpy())
    for _, r in out.iterrows():
        assert abs(r["share"] - vc.loc[r["brand_cnt"]] / tot) < 2e-6
    assert out["n_customers"].sum() == tot


def test_embed_anisotropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_anisotropy,
    )

    out = d_embed_anisotropy(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["embedding"])
    v = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(v * 1e6 + 0.5)
    n = q.shape[0]
    s = q.sum(axis=0)
    ss = float((s * s).sum())
    s2 = float((q * q).sum())
    aniso = (ss - s2) / (n * (n - 1) * 1e12)
    assert out["n_vecs"].iloc[0] == n
    assert abs(out["anisotropy"].iloc[0] - aniso) < 2e-6
    assert abs(out["centroid_norm"].iloc[0]
               - np.sqrt(ss) / (n * 1e6)) < 2e-6
    # cross-check the closed form against literal pairwise cosines
    # (quantized coords; unit-norm inputs so dot ≈ cosine)
    g = q @ q.T
    pair_mean = (g.sum() - np.trace(g)) / (n * (n - 1) * 1e12)
    assert abs(aniso - pair_mean) < 1e-9
