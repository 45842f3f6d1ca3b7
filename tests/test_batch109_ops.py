"""Batch 109: vocabulary Gini, first-order loyalty signal, k-NN
radius calibration."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_vocab_gini_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_vocab_gini,
    )

    out = d_vocab_gini(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    c = Counter()
    for t in docs["text"].fillna(""):
        c.update(t.split())
    x = np.sort(np.array(list(c.values()), dtype=np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    gini = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
    row = out.iloc[0]
    assert row["n_tokens"] == n
    assert row["total_occurrences"] == x.sum()
    assert abs(row["gini"] - gini) < 2e-6


def test_first_order_signal_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_first_order_signal,
    )

    out = q_first_order_signal(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["cents"] = np.floor(od["o_totalprice"] * 100
                           + 0.5).astype(int)
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    per = od.groupby("o_custkey").agg(cents=("cents", "first"),
                                      no=("cents", "size"))
    per["sub"] = per["no"] - 1
    fc = np.sort(per["cents"].to_numpy())
    m = fc[(len(fc) + 1) // 2 - 1]
    for grp, mask in (("high", per["cents"] >= m),
                      ("low", per["cents"] < m)):
        row = out[out["first_order_group"] == grp].iloc[0]
        sub = per.loc[mask, "sub"]
        assert row["n_customers"] == mask.sum()
        assert abs(row["mean_subsequent_orders"] - sub.mean()) < 2e-6
        assert abs(row["repeat_share"]
                   - (sub > 0).mean()) < 2e-6


def test_knn_radius_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_radius,
    )

    out = d_knn_radius(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    ids = em["vec_id"].to_numpy(np.int64)
    nrm = np.linalg.norm(emb, axis=1)
    qidx = np.where(ids < 64)[0]
    rads = []
    for qi in qidx:
        sims = emb @ emb[qi] / (nrm * nrm[qi])
        order = sorted(range(len(ids)),
                       key=lambda j: (-sims[j], ids[j]))
        top = [j for j in order if ids[j] != ids[qi]][:5]
        rads.append(1.0 - sims[top[4]])
    r = np.sort(np.array(rads))
    n = len(r)
    row = out.iloc[0]
    assert row["n_probes"] == n
    assert abs(row["median_radius"] - r[(n + 1) // 2 - 1]) < 2e-6
    assert abs(row["p90_radius"]
               - r[int(np.ceil(0.9 * n)) - 1]) < 2e-6
    assert abs(row["max_radius"] - r[-1]) < 2e-6
