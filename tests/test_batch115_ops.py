"""Batch 115: positional JSD, value-CV trend, per-language token
cost sheet."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_position_jsd_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_position_jsd,
    )

    out = d_position_jsd(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    ca, cb = Counter(), Counter()
    for t in docs["text"].fillna(""):
        ws = t.split()
        h = (len(ws) + 1) // 2
        ca.update(ws[:h])
        cb.update(ws[h:])
    n_a, n_b = sum(ca.values()), sum(cb.values())
    toks = set(ca) | set(cb)
    jsd = 0.0
    for tk in toks:
        p = ca[tk] / n_a
        q = cb[tk] / n_b
        m = 0.5 * (p + q)
        if p > 0:
            jsd += 0.5 * p * np.log(p / m)
        if q > 0:
            jsd += 0.5 * q * np.log(q / m)
    row = out.iloc[0]
    assert row["n_first_half"] == n_a
    assert row["n_second_half"] == n_b
    assert abs(row["jsd"] - jsd) < 2e-6


def test_value_cv_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_value_cv_trend,
    )

    out = t_value_cv_trend(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    ev["m"] = ev["ts"].dt.year * 100 + ev["ts"].dt.month
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("m")["c"]
    assert len(out) == g.ngroups
    for _, row in out.iterrows():
        c = g.get_group(row["month"]).to_numpy(float)
        assert row["n_events"] == len(c)
        if len(c) >= 2 and c.sum() > 0:
            cv = np.sqrt(len(c) * (c * c).sum()
                         - c.sum() ** 2) / c.sum()
            assert abs(row["value_cv"] - cv) < 2e-6


def test_lang_token_cost_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lang_token_cost,
    )

    out = d_lang_token_cost(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "text"])
    rows = {}
    for _, r in docs.iterrows():
        ws = (r["text"] or "").split()
        d, t, c = rows.get(r["lang"], (0, 0, 0))
        rows[r["lang"]] = (d + 1, t + len(ws),
                           c + sum(len(w) for w in ws))
    assert list(out["lang"]) == sorted(rows)
    for _, row in out.iterrows():
        d, t, c = rows[row["lang"]]
        assert row["n_docs"] == d
        assert row["n_tokens"] == t
        assert abs(row["tokens_per_doc"] - t / d) < 2e-6
        assert abs(row["chars_per_token"] - c / t) < 2e-6
