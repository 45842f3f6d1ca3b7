"""Theil-Sen / Mann-Whitney / cross-source dup audit vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    return np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)


def test_theil_sen_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_theil_sen

    out = q_theil_sen(SF).iloc[0]
    y = _dense_hourly()
    n = len(y)
    i, j = np.triu_indices(n, k=1)
    slopes = np.sort((y[j] - y[i]) / (j - i))
    m = len(slopes)
    slope = slopes[(m + 1) // 2 - 1]
    assert int(out["n_hours"]) == n and int(out["n_pairs"]) == m
    assert out["slope"] == slope  # element selection: exact
    resid = np.sort(y - slope * np.arange(n))
    assert out["intercept"] == resid[(n + 1) // 2 - 1]
    # robustness: corrupting one hour must not move the slope much
    y2 = y.copy()
    y2[n // 2] += 10_000
    s2 = np.sort((y2[j] - y2[i]) / (j - i))[(m + 1) // 2 - 1]
    assert abs(s2 - slope) < 0.1


def test_mann_whitney_matches_scipy_formula(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_mann_whitney,
    )

    out = q_mann_whitney(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    odd = ev["user_id"].to_numpy() % 2 == 1
    x, yv = cents[odd], cents[~odd]
    n1, n0 = len(x), len(yv)
    allv = np.concatenate([x, yv])
    # average ranks with ties
    order = allv.argsort(kind="mergesort")
    ranks = np.empty(len(allv), np.float64)
    sv = allv[order]
    i = 0
    r = 1
    while i < len(sv):
        jj = i
        while jj + 1 < len(sv) and sv[jj + 1] == sv[i]:
            jj += 1
        ranks[order[i:jj + 1]] = (r + r + (jj - i)) / 2.0
        r += jj - i + 1
        i = jj + 1
    r1 = ranks[:n1].sum()
    u1 = n1 * n0 + n1 * (n1 + 1) / 2 - r1
    _, t = np.unique(allv, return_counts=True)
    ties = int((t.astype(object) ** 3 - t.astype(object)).sum())
    n = n1 + n0
    mu = n1 * n0 / 2
    sig2 = n1 * n0 / 12 * ((n + 1) - ties / (n * (n - 1)))
    assert int(out["n1"]) == n1 and int(out["n0"]) == n0
    assert out["u1"] == u1
    assert int(out["tie_sum"]) == ties
    assert abs(out["z"] - (u1 - mu) / np.sqrt(sig2)) < 5e-6


def test_cross_source_dups_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_cross_source_dups,
    )

    out = d_cross_source_dups(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    srcs = sorted(docs["source"].unique())
    nxt = {s: srcs[(i + 1) % len(srcs)] for i, s in enumerate(srcs)}
    inj = docs[docs["doc_id"] % 37 == 0].assign(
        source=lambda d: d["source"].map(nxt))
    allrows = pd.concat([docs[["source", "text"]],
                         inj[["source", "text"]]])
    v = allrows.drop_duplicates()
    from collections import Counter
    pair = Counter()
    for _, g in v.groupby("text"):
        ss = sorted(g["source"].unique())
        for a in range(len(ss)):
            for b in range(a + 1, len(ss)):
                pair[(ss[a], ss[b])] += 1
    assert len(out) == len(pair)
    for _, r in out.iterrows():
        assert pair[(r["src_a"], r["src_b"])] == int(r["n_shared"])
    # every injected doc produced exactly one cross-source pairing
    assert out["n_shared"].sum() == (docs["doc_id"] % 37 == 0).sum()
