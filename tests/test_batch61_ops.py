"""Batch 61: burstiness, stickiness, sentence dedup."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_burstiness_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_burstiness,
    )

    out = t_burstiness(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "event_id"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    for et, g in ev.groupby("event_type"):
        g = g.sort_values(["us", "event_id"], kind="stable")
        d = np.diff(g["us"].to_numpy()).astype(float)
        if len(d) < 2:
            assert et not in out.index
            continue
        mu, sig = d.mean(), d.std()  # population std
        ref = (sig - mu) / (sig + mu)
        r = out.loc[et]
        assert r["n_gaps"] == len(d)
        assert abs(r["mean_gap_sec"] - mu / 1e6) < 1e-4
        assert abs(r["burstiness"] - ref) < 1e-5
        assert -1.0 - 1e-9 <= r["burstiness"] <= 1.0 + 1e-9


def test_stickiness_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_stickiness,
    )

    out = t_stickiness(SF).set_index("week")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
    ud = ev[["user_id", "d"]].drop_duplicates()
    ud["w"] = ud["d"] // 7
    for w, g in ud.groupby("w"):
        user_days = len(g)
        wau = g["user_id"].nunique()
        r = out.loc[w]
        assert r["user_days"] == user_days
        assert r["wau"] == wau
        assert abs(r["stickiness"] - user_days / 7 / wau) < 2e-6
        # bounded by the definition: 1/7 <= stickiness <= 1 when every
        # active day falls inside the week
        assert r["stickiness"] <= 1.0 + 1e-9


def test_sentence_dedup_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_sentence_dedup,
    )

    out = d_sentence_dedup(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter
    cnt = Counter()
    for t in docs["text"]:
        for sent in (t or "").split("."):
            sent = sent.strip(" ")
            if len(sent.split()) >= 3:
                cnt[sent] += 1
    total = sum(cnt.values())
    rep = sum(c - 1 for c in cnt.values())
    top = max(cnt.values())
    assert out["n_sentences"].iloc[0] == total
    assert out["n_distinct"].iloc[0] == len(cnt)
    assert out["repeated_occurrences"].iloc[0] == rep
    assert out["top_count"].iloc[0] == top
    assert abs(out["repeat_share"].iloc[0] - rep / total) < 2e-6
