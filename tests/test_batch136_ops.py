"""Batch 136: per-type value tail, activation intensity curve,
self-calibrating long-token census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_type_value_tail(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_value_tail,
    )

    out = t_type_value_tail(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    assert list(out["event_type"]) == \
        sorted(ev["event_type"].unique())
    for _, row in out.iterrows():
        c = np.sort(ev.loc[ev["event_type"] == row["event_type"],
                           "c"].to_numpy())
        n = len(c)
        assert row["n_events"] == n
        assert row["p99_cents"] == c[int(np.ceil(0.99 * n)) - 1]
        assert row["max_cents"] == c[-1]


def test_activation_intensity(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_activation_intensity,
    )

    out = t_activation_intensity(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    rows = {}
    for u, g in ev.groupby("user_id"):
        fd = g["d"].min()
        c = int((g["d"] == fd).sum())
        b = "1" if c == 1 else ("2-3" if c <= 3 else "4+")
        off = g["d"] - fd
        r = int(((off >= 7) & (off <= 13)).any())
        n, s = rows.get(b, (0, 0))
        rows[b] = (n + 1, s + r)
    assert list(out["first_day_bucket"]) == sorted(rows)
    for _, row in out.iterrows():
        n, s = rows[row["first_day_bucket"]]
        assert row["n_users"] == n
        assert row["n_retained_week1"] == s
        assert abs(row["week1_retention"] - s / n) < 2e-6


def test_long_token_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_long_token_census,
    )

    out = d_long_token_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    c = Counter()
    for t in docs["text"].fillna(""):
        c.update(t.split())
    total = sum(c.values())
    lens = sorted((len(w), n) for w, n in c.items())
    cum = 0
    for ln, n in [(ln, sum(n for w, n in c.items()
                           if len(w) == ln))
                  for ln in sorted({len(w) for w in c})]:
        cum += n
        if cum >= int(np.ceil(0.9 * total)):
            p90 = ln
            break
    tail = {w: n for w, n in c.items() if len(w) > p90}
    assert len(out) > 0, "fixture must have a length tail"
    assert (out["p90_length"] == p90).all()
    n_long = sum(tail.values())
    assert abs(out.iloc[0]["long_token_share"]
               - n_long / total) < 2e-6
    exp = sorted(tail.items(),
                 key=lambda kv: (-len(kv[0]), kv[0]))[:10]
    for i, (tok, n) in enumerate(exp):
        row = out.iloc[i]
        assert row["token"] == tok
        assert row["length"] == len(tok)
        assert row["n_occurrences"] == n
