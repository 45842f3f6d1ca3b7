"""Batch 104: kNN-graph transitivity, per-label embedding norm bias,
line-position entry-bias audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _knn(emb, ids, qidx, k):
    sims = emb[qidx] @ emb.T
    nrm = np.linalg.norm(emb, axis=1)
    sims = sims / (nrm[qidx][:, None] * nrm[None, :])
    out = {}
    for row, qi in enumerate(qidx):
        order = sorted(range(len(ids)),
                       key=lambda j: (-sims[row, j], ids[j]))
        nb = [ids[j] for j in order if ids[j] != ids[qi]][:k]
        out[ids[qi]] = nb
    return out


def test_knn_transitivity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_transitivity,
    )

    out = d_knn_transitivity(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    ids = em["vec_id"].to_numpy(np.int64).tolist()
    qidx = [i for i, v in enumerate(ids) if v < 64]
    nb1 = _knn(emb, ids, qidx, 5)
    nbr_all = sorted({x for v in nb1.values() for x in v})
    id2idx = {v: i for i, v in enumerate(ids)}
    nb2 = _knn(emb, ids, [id2idx[v] for v in nbr_all], 5)
    n_pairs = n_closed = 0
    for q, nbs in nb1.items():
        for a in nbs:
            for b in nbs:
                if a == b:
                    continue
                n_pairs += 1
                if b in nb2[a]:
                    n_closed += 1
    row = out.iloc[0]
    assert row["n_probes"] == len(nb1)
    assert row["n_pairs"] == n_pairs
    assert row["n_closed"] == n_closed
    assert abs(row["transitivity"] - n_closed / n_pairs) < 2e-6


def test_embed_norm_bias_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_norm_bias,
    )

    out = d_embed_norm_bias(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(emb, axis=1)
    df = pd.DataFrame({"label": em["label"].astype(int), "n": nrm})
    g = df.groupby("label")["n"].agg(["size", "mean"])
    gmean = nrm.mean()
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["label"]]
        assert row["n_vecs"] == e["size"]
        assert abs(row["mean_norm"] - e["mean"]) < 1e-4
        assert abs(row["norm_ratio"] - e["mean"] / gmean) < 1e-4


def test_linenumber_bias_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_linenumber_bias,
    )

    out = q_linenumber_bias(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_linenumber", "l_discount",
                                  "l_quantity"])
    li["d"] = np.floor(li["l_discount"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    li["q"] = np.floor(li["l_quantity"].to_numpy() + 0.5) \
        .astype(np.int64)
    g = li.groupby("l_linenumber").agg(
        n=("d", "size"), d=("d", "mean"), q=("q", "mean"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["linenumber"]]
        assert row["n_lines"] == e["n"]
        assert abs(row["mean_discount_bp"] - e["d"]) < 2e-6
        assert abs(row["mean_quantity"] - e["q"]) < 2e-6
