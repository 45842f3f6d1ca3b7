"""Wasserstein-1 / rank-biased overlap / one-way ANOVA vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_wasserstein_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_wasserstein,
    )

    out = d_wasserstein(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    corpus = np.sort(docs["n_chars"].to_numpy(np.float64))
    for src, g in docs.groupby("source"):
        a = np.sort(g["n_chars"].to_numpy(np.float64))
        # brute-force W1 via the CDF-difference integral on the grid
        grid = np.unique(corpus)
        cdf_a = np.searchsorted(a, grid, side="right") / len(a)
        cdf_c = np.searchsorted(corpus, grid, side="right") / len(corpus)
        w1 = float((np.abs(cdf_a - cdf_c)[:-1] * np.diff(grid)).sum())
        assert int(out.loc[src, "n"]) == len(a)
        assert abs(out.loc[src, "w1"] - w1) < 5e-6
        assert out.loc[src, "w1"] >= -1e-9


def test_rbo_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_rbo

    out = d_rbo(SF).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter

    def topk(mask, k=25):
        cnt = Counter()
        for t in docs.loc[mask, "text"]:
            cnt.update((t or "").split())
        return [w for w, _ in sorted(cnt.items(),
                                     key=lambda x: (-x[1], x[0]))[:k]]

    a = topk(docs["doc_id"] % 2 == 0)
    b = topk(docs["doc_id"] % 2 == 1)
    p, K = 0.5, 25
    num = sum(len(set(a[:d]) & set(b[:d])) / d * p ** (d - 1)
              for d in range(1, K + 1))
    rbo = num / (2 - p ** (K - 1))
    assert bool(out["top1_match"]) == (a[0] == b[0])
    assert abs(out["rbo"] - rbo) < 5e-6
    assert 0.0 <= out["rbo"] <= 1.0 + 1e-9


def test_anova_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_anova

    out = q_anova(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    c = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    g = ev.assign(c=c).groupby("event_type")["c"]
    k = g.ngroups
    N = len(ev)
    grand = c.mean()
    ssb = float(sum(len(x) * (x.mean() - grand) ** 2 for _, x in g))
    ssw = float(sum(((x - x.mean()) ** 2).sum() for _, x in g))
    f = (ssb / (k - 1)) / (ssw / (N - k))
    assert int(out["k"]) == k and int(out["n"]) == N
    assert abs(out["ssb"] - ssb) < max(1e-2, 1e-8 * abs(ssb))
    assert abs(out["ssw"] - ssw) < max(1e-2, 1e-8 * abs(ssw))
    assert abs(out["f_stat"] - f) < 1e-4
    assert abs(out["eta2"] - ssb / (ssb + ssw)) < 1e-6
    assert 0.0 <= out["eta2"] <= 1.0
