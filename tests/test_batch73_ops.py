"""Batch 73: order-size histogram, token-length profile, embedding
dimension variance."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_size_hist_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_size_hist,
    )

    out = q_order_size_hist(SF).set_index("size")
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    per = li.groupby("l_orderkey").size()
    sizes = od["o_orderkey"].map(per).fillna(0).astype(int)
    tot = len(od)
    for s, c in sizes.value_counts().items():
        r = out.loc[s]
        assert r["n_orders"] == c
        assert abs(r["share"] - c / tot) < 2e-6
    assert int(out["n_orders"].sum()) == tot
    # every lineitem is accounted for
    assert sum(int(s) * int(out.loc[s, "n_orders"]) for s in out.index) \
        == len(li)


def test_token_length_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_token_length_profile,
    )

    out = d_token_length_profile(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    for src, g in docs.groupby("source"):
        lens = np.array([len(w) for t in g["text"]
                         for w in (t or "").split()], dtype=np.int64)
        nt = len(lens)
        r = out.loc[src]
        assert r["n_tokens"] == nt
        assert abs(r["mean_len"] - lens.mean()) < 2e-6
        srt = np.sort(lens)
        assert r["p90_len"] == srt[(9 * nt + 9) // 10 - 1]
        assert abs(r["long_share"] - (lens >= 10).mean()) < 2e-6


def test_embed_dim_variance_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_dim_variance,
    )

    out = d_embed_dim_variance(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["embedding"])
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(M * 1e6 + 0.5).astype(np.int64)
    n = q.shape[0]
    assert list(out["dim"]) == list(range(M.shape[1]))
    assert (out["n"] == n).all()
    s1 = q.sum(axis=0)
    s2 = (q.astype(object) * q.astype(object)).sum(axis=0)
    for d in range(M.shape[1]):
        mean = s1[d] / (n * 1e6)
        var = float(n * s2[d] - int(s1[d]) ** 2) / (n * n * 1e12)
        assert abs(out["mean_v"].iloc[d] - mean) < 2e-6
        assert abs(out["var_v"].iloc[d] - var) < 2e-6
    # sanity: variances are positive and in a plausible band for
    # roughly unit-normalized 64-dim embeddings
    assert (out["var_v"] > 0).all()
    assert out["var_v"].max() < 1.0
