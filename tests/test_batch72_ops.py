"""Batch 72: dup by length, core vocab, weekend mix."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dup_by_length_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_dup_by_length,
    )

    out = d_dup_by_length(SF).set_index("decile")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "n_chars"])
    docs["h"] = [hashlib.md5((t or "").encode()).hexdigest()
                 for t in docs["text"]]
    grp = docs.groupby(["h", "n_chars"]).size().reset_index(name="n")
    lens = np.sort(docs["n_chars"].to_numpy(np.int64))
    n = len(lens)
    cuts = [lens[(k * n + 9) // 10 - 1] for k in range(1, 10)]
    grp["dec"] = np.searchsorted(np.array(cuts),
                                 grp["n_chars"].to_numpy(), side="left")
    for d, g in grp.groupby("dec"):
        nd = int(g["n"].sum())
        dd = int(g.loc[g["n"] >= 2, "n"].sum())
        r = out.loc[d]
        assert r["n_docs"] == nd
        assert r["dup_docs"] == dd
        assert abs(r["dup_rate"] - dd / nd) < 2e-6
    assert int(out["n_docs"].sum()) == len(docs)


def test_core_vocab_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_core_vocab,
    )

    out = d_core_vocab(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter, defaultdict
    pres = defaultdict(set)
    mass = Counter()
    for src, t in zip(docs["source"], docs["text"]):
        for w in (t or "").split():
            pres[w].add(src)
            mass[w] += 1
    ns = docs["source"].nunique()
    core = [w for w in pres if len(pres[w]) == ns]
    total = sum(mass.values())
    core_mass = sum(mass[w] for w in core)
    assert out["n_sources"].iloc[0] == ns
    assert out["vocab_size"].iloc[0] == len(pres)
    assert out["core_vocab"].iloc[0] == len(core)
    assert abs(out["core_mass_share"].iloc[0] - core_mass / total) < 2e-6
    # core tokens are few but mass-heavy (Zipf): share >> vocab ratio
    assert out["core_mass_share"].iloc[0] \
        > out["core_vocab"].iloc[0] / out["vocab_size"].iloc[0]


def test_weekend_mix_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_weekend_mix,
    )

    out = t_weekend_mix(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    dow = ((ev["ts"].astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000) + 4) % 7
    ev["wk"] = (dow == 0) | (dow == 6)
    for et, g in ev.groupby("event_type"):
        n, w = len(g), int(g["wk"].sum())
        r = out.loc[et]
        assert r["n"] == n
        assert r["weekend_n"] == w
        assert abs(r["weekend_share"] - w / n) < 2e-6
        assert abs(r["weekend_lift"] - (w / n) * 3.5) < 1e-5
