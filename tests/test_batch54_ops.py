"""Batch 54: ordered funnel, MDE power analysis, doc co-occurrence PMI."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_funnel_ordered_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_funnel_ordered,
    )

    out = q_funnel_ordered(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    n_view = n_click = n_full = 0
    for _u, g in ev.groupby("user_id"):
        v = g.loc[g["event_type"] == "view", "us"]
        if v.empty:
            continue
        n_view += 1
        tv = v.min()
        c = g.loc[(g["event_type"] == "click") & (g["us"] >= tv), "us"]
        if c.empty:
            continue
        n_click += 1
        tc = c.min()
        p = g.loc[(g["event_type"] == "purchase") & (g["us"] >= tc), "us"]
        if not p.empty:
            n_full += 1
    assert out["n_users"].iloc[0] == ev["user_id"].nunique()
    assert out["n_view"].iloc[0] == n_view
    assert out["n_view_click"].iloc[0] == n_click
    assert out["n_full_funnel"].iloc[0] == n_full
    assert abs(out["funnel_rate"].iloc[0] - n_full / n_view) < 2e-6
    # funnel stages can only shrink
    assert n_view >= n_click >= n_full


def test_mde_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_mde,
    )

    out = q_mde(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id", "value"])
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    for et, g in ev.groupby("event_type"):
        a = g.loc[g["user_id"] % 2 == 1, "cents"].to_numpy()
        b = g.loc[g["user_id"] % 2 == 0, "cents"].to_numpy()
        if len(a) < 2 or len(b) < 2:
            assert et not in out.index
            continue
        pooled = ((a.var() * len(a) + b.var() * len(b))
                  / (len(a) + len(b) - 2))
        ref = 2.801585219 * np.sqrt(
            pooled * (1 / len(a) + 1 / len(b))) / 100.0
        r = out.loc[et]
        assert r["n_odd"] == len(a)
        assert r["n_even"] == len(b)
        assert abs(r["mde_value"] - ref) < max(1e-5, 1e-6 * abs(ref))


def test_doc_cooccur_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_doc_cooccur,
    )

    out = d_doc_cooccur(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter
    tot = Counter()
    doc_sets = []
    for t in docs["text"]:
        ws = (t or "").split()
        tot.update(ws)
        doc_sets.append(set(ws))
    top = [t for t, _c in sorted(tot.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:10]]
    n = len(doc_sets)
    df = {t: sum(1 for s in doc_sets if t in s) for t in top}
    got = out.set_index(["tok_a", "tok_b"])
    cnt = 0
    for i, a in enumerate(top):
        for b in top[i + 1:]:
            ta, tb = min(a, b), max(a, b)
            dab = sum(1 for s in doc_sets if a in s and b in s)
            if dab == 0:
                assert (ta, tb) not in got.index
                continue
            r = got.loc[(ta, tb)]
            assert r["df_ab"] == dab
            ref = np.log(n * dab / (df[a] * df[b]))
            assert abs(r["pmi"] - ref) < 5e-6
            cnt += 1
    assert cnt == len(out)
