"""Batch 86: late-shipment return rates, supplier latency league
table, collocational context diversity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _joined_delays():
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_returnflag"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    s = j["l_shipdate"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    o = j["o_orderdate"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    j["gap"] = s - o
    return j


def test_late_returns_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_late_returns,
    )

    out = q_late_returns(SF)
    j = _joined_delays()
    j["b"] = np.where(j["gap"] <= 30, 0, np.where(j["gap"] <= 60, 1, 2))
    j["r"] = (j["l_returnflag"] == "R").astype(int)
    g = j.groupby("b").agg(n=("r", "size"), r=("r", "sum"))
    grate = g["r"].sum() / g["n"].sum()
    assert len(out) == len(g)
    for _, row in out.iterrows():
        n, r = g.loc[row["bucket"], "n"], g.loc[row["bucket"], "r"]
        assert (row["n_lines"], row["n_returned"]) == (n, r)
        assert abs(row["return_rate"] - r / n) < 2e-6
        assert abs(row["lift"] - (r / n) / grate) < 2e-6


def test_supplier_latency_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supplier_latency,
    )

    out = q_supplier_latency(SF)
    j = _joined_delays()
    g = j.groupby("l_suppkey")["gap"]
    assert len(out) == j["l_suppkey"].nunique()
    for _, row in out.iterrows():
        gaps = np.sort(g.get_group(row["suppkey"]).to_numpy())
        n = len(gaps)
        assert row["n_lines"] == n
        assert row["median_delay_days"] == gaps[(n + 1) // 2 - 1]
        assert row["p90_delay_days"] == gaps[(9 * n + 9) // 10 - 1]
        assert abs(row["mean_delay_days"] - gaps.mean()) < 2e-6


def test_context_diversity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_context_diversity,
    )

    out = d_context_diversity(SF)
    dc = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt: dict = {}
    for t in dc["text"].fillna(""):
        for w in t.split():
            cnt[w] = cnt.get(w, 0) + 1
    tops = set(
        [w for w, _ in sorted(cnt.items(),
                              key=lambda kv: (-kv[1], kv[0]))[:10]])
    pairs: dict = {}
    for t in dc["text"].fillna(""):
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a in tops:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    lefts = sorted({a for a, _ in pairs})
    assert out["token"].tolist() == lefts
    for _, row in out.iterrows():
        sub = {b: c for (a, b), c in pairs.items()
               if a == row["token"]}
        nn = sum(sub.values())
        assert row["n_pairs"] == nn
        assert row["distinct_rights"] == len(sub)
        ent = sum(-(c / nn) * np.log(c / nn) for c in sub.values())
        assert abs(row["neighbor_entropy_bits"]
                   - ent / np.log(2)) < 3e-6
        best = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (row["top_right"], row["top_right_n"]) == best
