"""Batch 95: mutual kNN edge share, nation trade balance, Chao1
unseen-vocabulary estimator."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_knn_mutual_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_mutual,
    )

    out = d_knn_mutual(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    M = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = em["vec_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    M, ids = M[order], ids[order]

    def knn5(i):
        sims = M @ M[i]
        # ties: score desc, id asc; exclude self
        key = sorted(range(len(ids)),
                     key=lambda j: (-sims[j], ids[j]))
        return [int(ids[j]) for j in key if ids[j] != ids[i]][:5]

    probe_idx = [i for i in range(len(ids)) if ids[i] < 64]
    edges = [(int(ids[i]), n) for i in probe_idx for n in knn5(i)]
    id2idx = {int(v): i for i, v in enumerate(ids)}
    nbrs = sorted(set(n for _, n in edges))
    back = {n: set(knn5(id2idx[n])) for n in nbrs}
    n_mutual = sum(1 for q, n in edges if q in back[n])
    row = out.iloc[0]
    assert row["n_probes"] == len(probe_idx)
    assert row["n_edges"] == len(edges)
    assert row["n_mutual"] == n_mutual
    assert abs(row["mutual_share"] - n_mutual / len(edges)) < 2e-6


def test_trade_balance_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_trade_balance,
    )

    out = q_trade_balance(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    li = li.assign(cents=np.floor(li["l_extendedprice"].to_numpy()
                                  * 100 + 0.5).astype(np.int64))
    exp = li.merge(su, left_on="l_suppkey", right_on="s_suppkey") \
        .groupby("s_nationkey")["cents"].sum()
    imp = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(cu, left_on="o_custkey", right_on="c_custkey") \
        .groupby("c_nationkey")["cents"].sum()
    nm = na.set_index("n_nationkey")["n_name"]
    nations = sorted(set(exp.index) | set(imp.index))
    assert len(out) == len(nations)
    for _, row in out.iterrows():
        nk = int(na.loc[na["n_name"] == row["n_name"],
                        "n_nationkey"].iloc[0])
        e = int(exp.get(nk, 0))
        i = int(imp.get(nk, 0))
        assert int(row["export_cents"]) == e
        assert int(row["import_cents"]) == i
        assert int(row["net_cents"]) == e - i
    assert out["n_name"].tolist() == sorted(nm[nations].tolist())


def test_chao1_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_chao1,
    )

    out = d_chao1(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter

    for _, row in out.iterrows():
        cnt = Counter()
        for t in docs.loc[docs["source"] == row["source"],
                          "text"].fillna(""):
            cnt.update(t.split())
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        chao = v + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert row["vocab"] == v
        assert row["f1"] == f1
        assert row["f2"] == f2
        assert abs(row["chao1"] - chao) < 1e-4
        assert abs(row["unseen_share"] - (chao - v) / chao) < 1e-6
