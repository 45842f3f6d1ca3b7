"""Batch 107: Benford second-digit audit, per-doc hapax-share
census, Markov expected-steps-to-purchase."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_benford_second_digit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_benford_second_digit,
    )

    out = q_benford_second_digit(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice"])
    c = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(int)
    c = c[c >= 10]
    second = c.astype(str).str[1].astype(int)
    obs = second.value_counts().sort_index()
    N = int(obs.sum())
    assert len(out) == len(obs)
    chi2 = 0.0
    for _, row in out.iterrows():
        d = int(row["digit"])
        assert row["observed"] == obs.loc[d]
        p = sum(np.log10(1 + 1 / (10 * k + d)) for k in range(1, 10))
        assert abs(row["expected"] - N * p) < 2e-6
        chi2 += (obs.loc[d] - N * p) ** 2 / (N * p)
    assert abs(out.iloc[0]["chi2"] - chi2) < 1e-3


def test_doc_tail_share_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_doc_tail_share,
    )

    out = d_doc_tail_share(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter
    tot = Counter()
    per_doc = []
    for t in docs["text"].fillna(""):
        ws = t.split()
        if not ws:
            continue
        per_doc.append(ws)
        tot.update(ws)
    counts = sorted(tot.values())
    m = counts[(len(counts) + 1) // 2 - 1]
    tail = {w for w, n in tot.items() if n < m}
    buckets = np.zeros(10, np.int64)
    shares = []
    for ws in per_doc:
        h = sum(1 for w in ws if w in tail)
        n = len(ws)
        buckets[min(9, (10 * h) // n)] += 1
        shares.append(h / n)
    assert (buckets > 0).sum() > 1, \
        "fixture must spread docs across buckets"
    exp = {b: int(f) for b, f in enumerate(buckets) if f > 0}
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        assert row["n_docs"] == exp[int(row["bucket"])]
    assert abs(out.iloc[0]["mean_share"] - np.mean(shares)) < 2e-6


def test_absorption_time_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_absorption_time,
    )

    out = t_absorption_time(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev["user_id"].to_numpy()
    et = ev["event_type"].to_numpy(object)
    same = u[1:] == u[:-1]
    pairs = pd.DataFrame({"cur": et[:-1][same], "nxt": et[1:][same]})
    c = pairs.groupby(["cur", "nxt"]).size()
    types = sorted(pairs["cur"].unique())
    # float Jacobi reference (no quantization): must agree to ~1e-3
    v = {t: 0.0 for t in types}
    for _ in range(200):
        nv = {}
        for t in types:
            if t == "purchase":
                nv[t] = 0.0
                continue
            n = c.loc[t].sum()
            nv[t] = 1.0 + sum(cnt * v.get(d, 0.0)
                              for d, cnt in c.loc[t].items()) / n
        v = nv
    assert list(out["event_type"]) == types
    for _, row in out.iterrows():
        assert abs(row["expected_steps"] - v[row["event_type"]]) \
            < 2e-3
    np_mask = out["event_type"] != "purchase"
    assert (out.loc[np_mask, "expected_steps"] > 1.0).all()
