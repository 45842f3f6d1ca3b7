"""Batch 97: timestamp-truncation audit, early-value LTV signal,
quantity round-number preference."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_timestamp_truncation_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_timestamp_truncation,
    )

    out = t_timestamp_truncation(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    n = len(us)
    exp = {
        "second_zero": (int((us % 60_000_000 == 0).sum()), 60),
        "minute_zero": (int((us % 3_600_000_000 == 0).sum()), 60),
        "hour_zero": (int((us % 86_400_000_000 == 0).sum()), 24),
    }
    for _, row in out.iterrows():
        k, b = exp[row["grain"]]
        assert row["n_aligned"] == k
        assert row["n_events"] == n
        assert abs(row["share"] - k / n) < 2e-6
        z = (k - n / b) / np.sqrt(n * (1 / b) * (1 - 1 / b))
        assert abs(row["binom_z"] - z) < 1e-4


def test_early_value_signal_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_early_value_signal,
    )

    out = t_early_value_signal(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    ev["d"] = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    ev["c"] = np.floor(ev["value"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    first = ev.groupby("user_id")["d"].transform("min")
    early = ev["d"] < first + 7
    per = pd.DataFrame({
        "u": ev["user_id"],
        "x": np.where(early, ev["c"], 0),
        "y": np.where(early, 0, ev["c"]),
    }).groupby("u").sum()
    r = np.corrcoef(per["x"], per["y"])[0, 1]
    row = out.iloc[0]
    assert row["n_users"] == len(per)
    assert abs(row["mean_week1_cents"] - per["x"].mean()) < 0.01
    assert abs(row["mean_later_cents"] - per["y"].mean()) < 0.01
    assert abs(row["early_late_corr"] - r) < 1e-4


def test_quantity_round_preference_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_quantity_round_preference,
    )

    out = q_quantity_round_preference(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity"])
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    n = len(q)
    lo, hi = int(q.min()), int(q.max())
    span = hi - lo + 1
    for _, row in out.iterrows():
        step = 10 if row["rule"] == "multiple_of_10" else 5
        k = int((q % step == 0).sum())
        hits = hi // step - (lo - 1) // step
        assert row["n_hits"] == k
        assert row["n_lines"] == n
        assert abs(row["share"] - k / n) < 2e-6
        assert abs(row["baseline"] - hits / span) < 2e-6
        p = hits / span
        z = (k - n * p) / np.sqrt(n * p * (1 - p))
        assert abs(row["binom_z"] - z) < 1e-4
