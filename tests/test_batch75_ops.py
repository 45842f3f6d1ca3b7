"""Batch 75: events per user-day, weekly mix-entropy trend, hapax
profile."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_events_per_userday_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_events_per_userday,
    )

    out = t_events_per_userday(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    d = ev["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    per = np.sort(ev.groupby([ev["user_id"], d]).size().to_numpy())
    n = len(per)
    assert out["n_userdays"].iloc[0] == n
    assert out["n_events"].iloc[0] == len(ev)
    assert abs(out["mean_per_day"].iloc[0] - len(ev) / n) < 2e-6
    assert out["p50"].iloc[0] == per[(n + 1) // 2 - 1]
    assert out["p90"].iloc[0] == per[(9 * n + 9) // 10 - 1]
    assert out["max_per_day"].iloc[0] == per[-1]


def test_mix_entropy_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_mix_entropy_trend,
    )

    out = t_mix_entropy_trend(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    w = (ev["ts"].astype("datetime64[us]").astype(np.int64)
         // (7 * 86_400_000_000))
    tab = ev.groupby([w, ev["event_type"]]).size()
    weeks = sorted(tab.index.get_level_values(0).unique())
    hs = []
    for wk in weeks:
        n = tab.loc[wk].to_numpy(np.float64)
        p = n / n.sum()
        hs.append(float((-p * np.log(p)).sum()))
    k = len(weeks)
    assert out["n_weeks"].iloc[0] == k
    assert abs(out["mean_entropy"].iloc[0] - np.mean(hs)) < 1e-4
    x = np.arange(k, dtype=np.float64)
    y = np.array(hs)
    slope = ((k * (x * y).sum() - x.sum() * y.sum())
             / (k * (x * x).sum() - x.sum() ** 2))
    assert abs(out["slope_per_week"].iloc[0] - slope) < 1e-4
    assert abs(out["h_first"].iloc[0] - hs[0]) < 1e-4
    assert abs(out["h_last"].iloc[0] - hs[-1]) < 1e-4


def test_hapax_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_hapax_profile,
    )

    out = d_hapax_profile(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    for src, g in docs.groupby("source"):
        c = Counter(w for t in g["text"] for w in (t or "").split())
        V = len(c)
        N = sum(c.values())
        h1 = sum(1 for v in c.values() if v == 1)
        h2 = sum(1 for v in c.values() if v == 2)
        r = out.loc[src]
        assert r["vocab"] == V
        assert r["n_tokens"] == N
        assert r["hapax"] == h1
        assert r["dis"] == h2
        assert abs(r["hapax_vocab_share"] - h1 / V) < 2e-6
        assert abs(r["hapax_mass_share"] - h1 / N) < 2e-6
