"""Circular mean hour vs brute-force reference at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_circular_mean_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_circular_mean,
    )

    out = t_circular_mean(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    hr = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
          // 3_600_000_000) % 24
    for et in ev["event_type"].unique():
        h = hr[ev["event_type"].to_numpy() == et]
        ang = 2 * np.pi * h / 24
        a, b = np.cos(ang).sum(), np.sin(ang).sum()
        mean_hr = (np.arctan2(b, a) / (2 * np.pi) * 24) % 24
        R = np.sqrt(a * a + b * b) / len(h)
        assert int(out.loc[et, "n"]) == len(h)
        # 24-entry micro trig table slack
        diff = abs(out.loc[et, "mean_hour"] - mean_hr)
        assert min(diff, 24 - diff) < 1e-3
        assert abs(out.loc[et, "resultant_r"] - R) < 1e-4
        assert 0.0 <= out.loc[et, "mean_hour"] < 24.0 + 1e-9
        assert 0.0 <= out.loc[et, "resultant_r"] <= 1.0 + 1e-9


def test_circular_mean_wraps_midnight(ray_session):
    # pure-unit check of the wrap semantics the operator relies on:
    # hours 23 and 1 average to 0, not 12
    ang = 2 * np.pi * np.array([23, 1]) / 24
    a, b = np.cos(ang).sum(), np.sin(ang).sum()
    mean_hr = (np.arctan2(b, a) / (2 * np.pi) * 24) % 24
    assert abs(mean_hr) < 1e-9 or abs(mean_hr - 24) < 1e-9
