"""Covariance / Spearman / chi2 / quantile-norm / lexical-diversity ops
vs brute-force references at sf0.001."""

from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_covariance_matches_numpy(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_covariance

    out = d_covariance(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)  # population covariance
    d = x.shape[1]
    assert len(out) == d * (d + 1) // 2
    got = out.set_index(["dim_a", "dim_b"])["cov"]
    for i, j in [(1, 1), (1, 2), (5, 9), (d, d), (3, d)]:
        assert abs(got.loc[(i, j)] - cov[i - 1, j - 1]) < 2e-6


def test_spearman_matches_scipy_style_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_spearman

    out = q_spearman(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_discount"]
    )
    r1 = li["l_quantity"].rank(method="average").to_numpy(np.float64)
    r2 = li["l_discount"].rank(method="average").to_numpy(np.float64)
    rho = np.corrcoef(r1, r2)[0, 1]
    assert int(out.loc[0, "n"]) == len(li)
    assert abs(out.loc[0, "spearman"] - rho) < 2e-6


def test_chi2_contingency_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_chi2

    out = fe_chi2(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_extendedprice", "l_returnflag"]
    )
    lo, hi = li["l_extendedprice"].min(), li["l_extendedprice"].max()
    b = np.minimum(
        np.maximum(np.ceil((li["l_extendedprice"] - lo) / ((hi - lo) / 10.0)) - 1, 0), 9
    ).astype(int)
    y = (li["l_returnflag"] == "R").astype(int)
    ct = pd.crosstab(b, y)
    n = ct.to_numpy().sum()
    # observed matches the contingency table exactly
    for _, row in out.iterrows():
        assert row["observed"] == ct.loc[row["bin"], row["y"]]
    # expected/contrib match the chi2 definition
    e = ct.sum(axis=1).to_numpy()[:, None] * ct.sum(axis=0).to_numpy()[None, :] / n
    for _, row in out.iterrows():
        i = ct.index.get_loc(row["bin"])
        j = ct.columns.get_loc(row["y"])
        assert abs(row["expected"] - e[i, j]) < 2e-6
        ref = (ct.iloc[i, j] - e[i, j]) ** 2 / e[i, j]
        assert abs(row["contrib"] - ref) < 1e-4
    # total chi2 is positive and finite (sanity on the statistic itself)
    assert 0 <= out["contrib"].sum() < np.inf


def test_quantile_norm_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_quantile_norm,
    )

    out = d_quantile_norm(SF)
    doc = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    doc = doc.sort_values(["n_chars", "doc_id"])
    doc["rk"] = doc.groupby("source").cumcount() + 1
    qval = doc.groupby("rk")["n_chars"].mean()
    exp = doc.assign(qnorm=doc["rk"].map(qval)).sort_values("doc_id")
    got = out.sort_values("doc_id")
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), exp["doc_id"].to_numpy())
    np.testing.assert_allclose(
        got["qnorm"].to_numpy(), exp["qnorm"].to_numpy(), atol=2e-6
    )
    # quantile normalization equalizes the VALUE DISTRIBUTION across
    # equally-sized sources: every source ends with the same multiset
    sizes = got.groupby("source").size()
    if sizes.nunique() == 1:
        per_src = got.groupby("source")["qnorm"].apply(
            lambda s: tuple(sorted(s.round(6)))
        )
        assert per_src.nunique() == 1


def test_lexical_diversity_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lexical_diversity,
    )

    out = d_lexical_diversity(SF).set_index("source")
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
    for src, g in doc.groupby("source"):
        counts = Counter(w for t in g["text"].fillna("") for w in t.split())
        types = len(counts)
        tokens = sum(counts.values())
        hapax = sum(1 for c in counts.values() if c == 1)
        s2 = sum(c * (c - 1) for c in counts.values())
        row = out.loc[src]
        assert row["types"] == types and row["tokens"] == tokens
        assert row["hapax"] == hapax and row["s2"] == s2
        assert abs(row["ttr"] - types / tokens) < 2e-6
        assert abs(row["hapax_ratio"] - hapax / types) < 2e-6
        assert abs(row["simpson"] - s2 / (tokens * (tokens - 1))) < 2e-6
