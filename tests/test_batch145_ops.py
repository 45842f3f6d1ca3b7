"""Batch 145: NN decision margin, deepest-discount parts,
size-quantity correlation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_knn_margin(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_margin,
    )

    out = d_knn_margin(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    ids = em["vec_id"].to_numpy(np.int64)
    nrm = np.linalg.norm(emb, axis=1)
    qidx = np.where(ids < 64)[0]
    margins = []
    for qi in qidx:
        sims = emb @ emb[qi] / (nrm * nrm[qi])
        order = sorted(range(len(ids)),
                       key=lambda j: (-sims[j], ids[j]))
        top = [j for j in order if ids[j] != ids[qi]][:2]
        margins.append(sims[top[0]] - sims[top[1]])
    m = np.sort(np.array(margins))
    n = len(m)
    row = out.iloc[0]
    assert row["n_probes"] == n
    assert abs(row["median_margin"] - m[(n + 1) // 2 - 1]) < 3e-6
    assert abs(row["p90_margin"]
               - m[int(np.ceil(0.9 * n)) - 1]) < 3e-6
    assert abs(row["min_margin"] - m[0]) < 3e-6


def test_deepest_discount_parts(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_deepest_discount_parts,
    )

    out = q_deepest_discount_parts(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_discount"])
    li["bp"] = np.floor(li["l_discount"] * 100 + 0.5).astype(int)
    g = li.groupby("l_partkey")["bp"].agg(["size", "mean"])
    g = g[g["size"] >= 20]
    cand = sorted(
        ((round(m, 6), p, s) for p, (s, m) in g.iterrows()),
        key=lambda x: (-x[0], x[1]))[:10]
    assert len(out) == len(cand)
    for i, (m, p, s) in enumerate(cand):
        row = out.iloc[i]
        assert row["p_partkey"] == p
        assert row["n_lines"] == s
        assert abs(row["mean_discount_bp"] - m) < 2e-6


def test_size_quantity_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_size_quantity_corr,
    )

    out = q_size_quantity_corr(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_size"])
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    x = j["p_size"].to_numpy(float)
    y = np.floor(j["l_quantity"] + 0.5).astype(int) \
        .to_numpy(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_lines"] == len(j)
    assert abs(row["size_quantity_r"] - r) < 2e-6
