"""Batch 52: Lorenz deciles, McNemar, novelty curve vs brute force."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_lorenz_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_lorenz,
    )

    out = q_lorenz(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                           ).astype(np.int64)
    x = np.sort(od.groupby("o_custkey")["cents"].sum().to_numpy(np.int64))
    n, total = len(x), int(x.sum())
    assert len(out) == 10
    for k in range(1, 11):
        pk = (k * n) // 10
        cum = int(x[:pk].sum())
        r = out[out["decile"] == k].iloc[0]
        assert r["n_below"] == pk
        assert r["cum_cents"] == cum
        assert abs(r["cum_share"] - cum / total) < 2e-6
    # Lorenz curve is increasing and ends at 1
    assert (np.diff(out["cum_share"].to_numpy()) >= -1e-12).all()
    assert abs(out["cum_share"].iloc[-1] - 1.0) < 1e-9
    # convexity: poorest half holds at most half
    assert out[out["decile"] == 5]["cum_share"].iloc[0] <= 0.5 + 1e-9


def test_mcnemar_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_mcnemar,
    )

    out = q_mcnemar(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    per = ev.groupby("user_id")["event_type"].agg(set)
    clk = per.map(lambda s: "click" in s)
    pur = per.map(lambda s: "purchase" in s)
    b = int((clk & ~pur).sum())
    c = int((~clk & pur).sum())
    assert out["n_users"].iloc[0] == len(per)
    assert out["click_only"].iloc[0] == b
    assert out["purchase_only"].iloc[0] == c
    assert out["both_cnt"].iloc[0] == int((clk & pur).sum())
    assert out["neither"].iloc[0] == int((~clk & ~pur).sum())
    ref = 0.0 if b + c == 0 else (abs(b - c) - 1) ** 2 / (b + c)
    assert abs(out["mcnemar_chi2"].iloc[0] - ref) < 2e-6


def test_novelty_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_novelty_curve,
    )

    out = d_novelty_curve(SF).set_index("bucket")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    m1 = int(docs["doc_id"].max()) + 1
    from collections import Counter, defaultdict
    per_b = defaultdict(Counter)
    for did, txt in zip(docs["doc_id"], docs["text"]):
        per_b[(int(did) * 10) // m1].update((txt or "").split())
    first = {}
    for b in sorted(per_b):
        for t in per_b[b]:
            first.setdefault(t, b)
    for b in sorted(per_b):
        total = sum(per_b[b].values())
        nv = sum(c for t, c in per_b[b].items() if first[t] == b)
        nt = sum(1 for t in per_b[b] if first[t] == b)
        r = out.loc[b]
        assert r["total_toks"] == total
        assert r["novel_toks"] == nv
        assert r["novel_types"] == nt
        assert abs(r["novel_share"] - nv / total) < 2e-6
    # bucket 0 is maximally novel; novelty broadly decays after it
    assert abs(out.loc[0, "novel_share"] - 1.0) < 1e-9
    assert out["novel_share"].iloc[-1] < out["novel_share"].iloc[0]
