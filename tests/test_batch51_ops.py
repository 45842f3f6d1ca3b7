"""Batch 51: weekly hazard, Markov entropy rate, Burrows' Delta."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
WEEK_US = 604_800_000_000


def _labels():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    t_end = int(ev["us"].max())
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["us"].min()
    rows = []
    for u, t0 in s.items():
        pu = ev[(ev["event_type"] == "purchase") & (ev["user_id"] == u)
                & (ev["us"] >= t0)]["us"]
        if len(pu):
            rows.append((int(pu.min()) - int(t0), True))
        else:
            rows.append((t_end - int(t0), False))
    return rows


def test_hazard_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_hazard,
    )

    out = t_hazard(SF)
    labels = _labels()
    wk = np.array([d // WEEK_US for d, _ in labels])
    evt = np.array([e for _, e in labels])
    kmax = int(wk.max())
    assert len(out) == kmax + 1
    for k in range(kmax + 1):
        n_risk = int((wk >= k).sum())
        d = int(((wk == k) & evt).sum())
        r = out[out["week"] == k].iloc[0]
        assert r["n_risk"] == n_risk
        assert r["d_events"] == d
        assert abs(r["hazard"] - d / n_risk) < 2e-6
    # hazard is a probability
    assert ((out["hazard"] >= 0) & (out["hazard"] <= 1)).all()


def test_entropy_rate_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_entropy_rate,
    )

    out = q_entropy_rate(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    from collections import Counter
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ets = g["event_type"].tolist()
        for a, b in zip(ets, ets[1:]):
            trans[(a, b)] += 1
    n = sum(trans.values())
    row = Counter()
    for (a, _b), c in trans.items():
        row[a] += c
    h = -sum((c / n) * np.log2(c / row[a]) for (a, _b), c in trans.items())
    assert out["n_transitions"].iloc[0] == n
    assert out["n_cells"].iloc[0] == len(trans)
    assert abs(out["h_bits"].iloc[0] - h) < 5e-5
    # bounded by log2(#states)
    n_states = ev["event_type"].nunique()
    assert -1e-9 <= out["h_bits"].iloc[0] <= np.log2(n_states) + 1e-9


def test_burrows_delta_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_burrows_delta,
    )

    out = d_burrows_delta(SF).set_index(["src_a", "src_b"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    per_src, tot = {}, Counter()
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update((t or "").split())
        per_src[src] = cnt
        tot.update(cnt)
    top = [t for t, _c in sorted(tot.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:30]]
    srcs = sorted(per_src)
    ns = {s: sum(per_src[s].values()) for s in srcs}
    # float relative frequencies; the engine's 1e-9 integer scaling is
    # a fine enough grid that the z-score distance agrees to ~1e-4
    rel = {s: np.array([per_src[s].get(t, 0) / ns[s] for t in top])
           for s in srcs}
    mat = np.vstack([rel[s] for s in srcs])
    mu = mat.mean(axis=0)
    sd = mat.std(axis=0)  # population std across sources
    checked = 0
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            za = np.where(sd > 0, (rel[sa] - mu) / np.where(sd > 0, sd, 1),
                          0.0)
            zb = np.where(sd > 0, (rel[sb] - mu) / np.where(sd > 0, sd, 1),
                          0.0)
            ref = np.abs(za - zb).mean()
            got = out.loc[(sa, sb), "delta"]
            assert abs(got - ref) < 1e-3
            assert got >= -1e-9
            checked += 1
    assert checked == len(srcs) * (len(srcs) - 1) // 2
