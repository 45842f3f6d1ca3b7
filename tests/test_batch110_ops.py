"""Batch 110: segment-nation entropy, Zipf's abbreviation-law
profile, new-vs-returning value gap."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_segment_nation_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_segment_nation_entropy,
    )

    out = q_segment_nation_entropy(SF)
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_mktsegment", "c_nationkey"])
    segs = sorted(cu["c_mktsegment"].unique())
    assert list(out["segment"]) == segs
    for _, row in out.iterrows():
        c = cu[cu["c_mktsegment"] == row["segment"]] \
            ["c_nationkey"].value_counts().to_numpy(np.float64)
        n = c.sum()
        assert row["n_customers"] == n
        assert row["n_nations"] == len(c)
        if len(c) == 1:
            assert row["entropy"] == 0.0
        else:
            h = np.log(n) - (c * np.log(c)).sum() / n
            assert abs(row["entropy"] - h) < 2e-6
            assert abs(row["normalized_entropy"]
                       - h / np.log(len(c))) < 2e-6


def test_brevity_law_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_brevity_law,
    )

    out = d_brevity_law(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    c = Counter()
    for t in docs["text"].fillna(""):
        c.update(t.split())
    items = sorted(c.items(), key=lambda kv: (kv[1], kv[0]))
    V = len(items)
    rows = {}
    for i, (tok, n) in enumerate(items, 1):
        d = (10 * (i - 1)) // V + 1
        v, s, occ = rows.get(d, (0, 0, 0))
        rows[d] = (v + 1, s + len(tok), occ + n)
    assert len(out) == len(rows)
    for _, row in out.iterrows():
        v, s, occ = rows[int(row["decile"])]
        assert row["n_tokens"] == v
        assert row["n_occurrences"] == occ
        assert abs(row["mean_length"] - s / v) < 2e-6


def test_new_vs_returning_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_new_vs_returning,
    )

    out = t_new_vs_returning(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    first = ev.groupby("user_id")["d"].transform("min")
    new = ev[ev["d"] == first]
    ret = ev[ev["d"] != first]
    row = out.iloc[0]
    assert row["n_first_day_events"] == len(new)
    assert row["n_returning_events"] == len(ret)
    assert abs(row["mean_first_day_cents"]
               - new["cents"].mean()) < 2e-6
    assert abs(row["mean_returning_cents"]
               - ret["cents"].mean()) < 2e-6
    assert abs(row["returning_lift"]
               - ret["cents"].mean() / new["cents"].mean()) < 2e-5
