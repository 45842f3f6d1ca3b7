"""Batch 121: heatmap separability chi2, case-folding gain,
steps-to-convert."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_heatmap_separability_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_heatmap_separability,
    )

    out = t_heatmap_separability(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    dow = ((us // 86_400_000_000) + 4) % 7
    hr = (us // 3_600_000_000) % 24
    ct = pd.crosstab(dow, hr)
    N = ct.to_numpy().sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / N
    chi2 = ((ct.to_numpy(float) - exp) ** 2 / exp).sum()
    row = out.iloc[0]
    assert row["n_events"] == N
    assert row["n_dows"] == ct.shape[0]
    assert row["n_hours"] == ct.shape[1]
    assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(row["chi2"] - chi2) < 1e-2


def test_casefold_gain_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_casefold_gain,
    )

    out = d_casefold_gain(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    c = Counter()
    for t in docs["text"].fillna(""):
        c.update(t.split())
    v = len(c)
    vf = len({w.lower() for w in c})
    total = sum(c.values())
    cased = sum(n for w, n in c.items() if w != w.lower())
    row = out.iloc[0]
    assert row["n_vocab"] == v
    assert row["n_vocab_folded"] == vf
    assert abs(row["collapse_ratio"] - vf / v) < 2e-6
    assert abs(row["cased_instance_share"] - cased / total) < 2e-6


def test_steps_to_convert_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_steps_to_convert,
    )

    out = t_steps_to_convert(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["pos"] = ev.groupby("user_id").cumcount()
    conv = ev[ev["event_type"] == "purchase"] \
        .groupby("user_id")["pos"].min()
    steps = np.sort(conv.to_numpy())
    n = len(steps)
    row = out.iloc[0]
    assert row["n_converters"] == n
    assert row["median_steps"] == steps[(n + 1) // 2 - 1]
    assert abs(row["mean_steps"] - steps.mean()) < 2e-6
