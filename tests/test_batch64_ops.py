"""Batch 64: activity heatmap, G2 keyness, temperature mix budget."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_activity_heatmap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_activity_heatmap,
    )

    out = t_activity_heatmap(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    dow = ((us // 86_400_000_000) + 4) % 7
    hod = (us // 3_600_000_000) % 24
    from collections import Counter
    cnt = Counter(zip(dow, hod))
    n = len(ev)
    assert len(out) == 168
    chi2 = 0.0
    e = n / 168
    for (d, h), c in [((d, h), cnt.get((d, h), 0))
                      for d in range(7) for h in range(24)]:
        row = out[(out["dow"] == d) & (out["hod"] == h)].iloc[0]
        assert row["n"] == c
        assert abs(row["share"] - c / n) < 2e-6
        chi2 += (c - e) ** 2 / e
    assert abs(out["chi2_uniform"].iloc[0] - chi2) < 1e-3
    assert int(out["n"].sum()) == n
    # epoch day 0 (1970-01-01) was a Thursday: dow 0 must be Sunday
    ref_dow = pd.Series(us // 86_400_000_000).map(
        lambda d: (pd.Timestamp(d * 86400, unit="s").dayofweek + 1) % 7)
    assert (dow.to_numpy() == ref_dow.to_numpy()).all()


def test_keyness_g2_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_keyness_g2,
    )

    out = d_keyness_g2(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter
    ca, cb = Counter(), Counter()
    for did, t in zip(docs["doc_id"], docs["text"]):
        (ca if did % 2 == 1 else cb).update((t or "").split())
    na, nb = sum(ca.values()), sum(cb.values())
    scores = {}
    for tok in set(ca) | set(cb):
        a, b = ca.get(tok, 0), cb.get(tok, 0)
        if a + b < 5:
            continue
        g2 = 0.0
        ea = (a + b) * na / (na + nb)
        eb = (a + b) * nb / (na + nb)
        if a > 0:
            g2 += a * np.log(a / ea)
        if b > 0:
            g2 += b * np.log(b / eb)
        scores[tok] = 2 * g2
    ref = sorted(scores.items(),
                 key=lambda kv: (-round(kv[1], 5), kv[0]))[:10]
    assert len(out) == 10
    for (rt, rs), (_, row) in zip(ref, out.iterrows()):
        assert row["token"] == rt
        assert abs(row["g2"] - rs) < 1e-4
        assert row["n_odd"] == ca.get(rt, 0)
        assert row["n_even"] == cb.get(rt, 0)


def test_mix_budget_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_mix_budget,
    )

    out = d_mix_budget(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    cnt = docs.groupby("source")["text"].apply(
        lambda s: int(s.fillna("").str.count(r"\S+").sum()))
    tot = int(cnt.sum())
    xq = {s: int(np.floor((n / tot) ** 0.7 * 1e9 + 0.5005))
          for s, n in cnt.items()}
    sq = sum(xq.values())
    base = {s: (1_000_000 * x) // sq for s, x in xq.items()}
    rem = {s: (1_000_000 * x) % sq for s, x in xq.items()}
    left = 1_000_000 - sum(base.values())
    for s in sorted(xq, key=lambda s: (-rem[s], s))[:left]:
        base[s] += 1
    got = out.set_index("source")
    for s in xq:
        assert got.loc[s, "n_tokens"] == cnt[s]
        assert got.loc[s, "weight_nano"] == xq[s]
        assert got.loc[s, "token_budget"] == base[s]
    assert int(out["token_budget"].sum()) == 1_000_000
    # temperature upweights small sources: budget share exceeds raw
    # share for the smallest source, trails it for the largest
    small = cnt.idxmin()
    large = cnt.idxmax()
    assert got.loc[small, "token_budget"] / 1e6 > cnt[small] / tot
    assert got.loc[large, "token_budget"] / 1e6 < cnt[large] / tot
