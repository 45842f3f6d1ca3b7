"""Batch 77: dedup mix shift, lang x length chi2, acctbal-revenue
correlation."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dedup_mix_shift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_dedup_mix_shift,
    )

    out = d_dedup_mix_shift(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    docs["h"] = [hashlib.md5((t or "").encode()).hexdigest()
                 for t in docs["text"]]
    keep = docs.groupby("h")["doc_id"].transform("min")
    docs["rm"] = docs["doc_id"] != keep
    N = len(docs)
    K = N - int(docs["rm"].sum())
    for src, g in docs.groupby("source"):
        r = out.loc[src]
        n, rm = len(g), int(g["rm"].sum())
        assert r["n_docs"] == n
        assert r["removed"] == rm
        assert abs(r["removal_share"] - rm / n) < 2e-6
        assert abs(r["share_before"] - n / N) < 2e-6
        assert abs(r["share_after"] - (n - rm) / K) < 2e-6
    # the after-mix still sums to 1
    assert abs(out["share_after"].sum() - 1.0) < 1e-4


def test_lang_length_chi2_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lang_length_chi2,
    )

    out = d_lang_length_chi2(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    N = len(docs)
    lens = np.sort(docs["n_chars"].to_numpy(np.int64))
    cuts = np.array([lens[(k * N + 9) // 10 - 1] for k in range(1, 10)])
    dec = np.searchsorted(cuts, docs["n_chars"].to_numpy(np.int64),
                          side="left")
    tab = pd.crosstab(docs["lang"], dec)
    obs = tab.to_numpy(np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    e = row @ col / N
    chi2 = ((obs - e) ** 2 / e).sum()
    L, D = obs.shape
    v = np.sqrt(chi2 / (N * min(L - 1, D - 1)))
    assert out["n_docs"].iloc[0] == N
    assert out["n_langs"].iloc[0] == L
    assert out["df"].iloc[0] == (L - 1) * (D - 1)
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-3
    assert abs(out["cramers_v"].iloc[0] - v) < 1e-5


def test_acctbal_revenue_corr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_acctbal_revenue_corr,
    )

    out = q_acctbal_revenue_corr(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    c = np.floor(j["l_extendedprice"].to_numpy() * 100 + 0.5).astype(object)
    d = np.floor(j["l_discount"].to_numpy() * 100 + 0.5).astype(int)
    j["rev"] = c * (100 - d)
    rev = j.groupby("o_custkey")["rev"].sum()
    x = np.floor(cu["c_acctbal"].to_numpy() * 100 + 0.5)
    y = cu["c_custkey"].map(rev).fillna(0).to_numpy(np.float64)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_customers"].iloc[0] == len(cu)
    assert out["active"].iloc[0] == int((y > 0).sum())
    assert abs(out["corr"].iloc[0] - r) < 1e-5
