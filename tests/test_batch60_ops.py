"""Batch 60: adjacent embedding cosine, dup orders, event trigrams."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_embed_adjacent_sim_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_adjacent_sim,
    )

    out = d_embed_adjacent_sim(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    em = em.sort_values("vec_id")
    m = np.vstack(em["embedding"].to_numpy()).astype(np.float64)
    a, b = m[:-1], m[1:]
    c = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                          * np.linalg.norm(b, axis=1))
    q = np.sort(np.floor(c * 1e6 + 0.5005)) / 1e6
    n = len(q)
    assert out["n_pairs"].iloc[0] == n
    assert abs(out["mean_sim"].iloc[0] - q.mean()) < 2e-6
    assert abs(out["p10"].iloc[0] - q[max((1 * n + 9) // 10, 1) - 1]) \
        < 1e-9
    assert abs(out["p50"].iloc[0] - q[max((5 * n + 9) // 10, 1) - 1]) \
        < 1e-9
    assert abs(out["p90"].iloc[0] - q[max((9 * n + 9) // 10, 1) - 1]) \
        < 1e-9
    assert out["p10"].iloc[0] <= out["p50"].iloc[0] <= out["p90"].iloc[0]


def test_dup_orders_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_dup_orders,
    )

    out = q_dup_orders(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["c"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                       ).astype(np.int64)
    g = od.groupby(["o_custkey", "c"]).size()
    dup = g[g >= 2]
    assert out["n_orders"].iloc[0] == len(od)
    assert out["dup_groups"].iloc[0] == len(dup)
    assert out["dup_rows"].iloc[0] == int(dup.sum())
    assert out["max_group"].iloc[0] == int(g.max())
    assert abs(out["dup_share"].iloc[0] - int(dup.sum()) / len(od)) < 2e-6


def test_event_trigrams_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_event_trigrams,
    )

    out = t_event_trigrams(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    from collections import Counter
    cnt = Counter()
    for _u, g in ev.groupby("user_id"):
        ets = g["event_type"].tolist()
        for a, b, c in zip(ets, ets[1:], ets[2:]):
            cnt[f"{a}>{b}>{c}"] += 1
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == min(10, len(cnt))
    for (rt, rn), (_, row) in zip(ref, out.iterrows()):
        assert row["trigram"] == rt
        assert row["n"] == rn
