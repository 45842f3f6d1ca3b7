"""Batch 114: shingle-novelty curve, ARPU trend, lang x source
independence chi2."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_shingle_novelty_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_shingle_novelty,
    )

    out = d_shingle_novelty(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    splits = [t.split() for t in docs["text"].fillna("")]
    assert len(out) == 5
    for _, row in out.iterrows():
        n = int(row["n"])
        grams = []
        for ws in splits:
            grams.extend(" ".join(ws[i:i + n])
                         for i in range(len(ws) - n + 1))
        assert row["total_ngrams"] == len(grams)
        assert row["distinct_ngrams"] == len(set(grams))
        assert abs(row["novelty"]
                   - len(set(grams)) / len(grams)) < 2e-6
    nv = out["novelty"].to_numpy()
    assert (np.diff(nv) >= 0).all(), "novelty must grow with n"


def test_arpu_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_arpu_trend,
    )

    out = q_arpu_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["y"] = od["o_orderdate"].dt.year
    od["cents"] = np.floor(od["o_totalprice"] * 100
                           + 0.5).astype(int)
    g = od.groupby("y").agg(rev=("cents", "sum"),
                            users=("o_custkey", "nunique"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["year"]]
        assert row["n_active_customers"] == e["users"]
        assert row["revenue_cents"] == str(int(e["rev"]))
        assert abs(row["arpu_cents"] - e["rev"] / e["users"]) < 2e-6


def test_lang_source_chi2_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lang_source_chi2,
    )

    out = d_lang_source_chi2(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    ct = pd.crosstab(docs["lang"], docs["source"])
    N = ct.to_numpy().sum()
    row = ct.sum(axis=1).to_numpy(float)
    col = ct.sum(axis=0).to_numpy(float)
    exp = np.outer(row, col) / N
    chi2 = ((ct.to_numpy(float) - exp) ** 2 / exp).sum()
    r = out.iloc[0]
    assert r["n_docs"] == N
    assert r["n_langs"] == ct.shape[0]
    assert r["n_sources"] == ct.shape[1]
    assert r["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(r["chi2"] - chi2) < 1e-2
