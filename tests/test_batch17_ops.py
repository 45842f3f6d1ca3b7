"""Theil index / mixture entropy / time-to-event vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_theil_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_theil

    out = d_theil(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    for src, g in docs.groupby("source"):
        v = g["n_chars"].to_numpy(np.float64)
        mu = v.mean()
        theil = float(np.mean((v / mu) * np.log(v / mu)))
        assert int(out.loc[src, "n"]) == len(v)
        assert abs(out.loc[src, "theil_t"] - theil) < 5e-6
        # Theil-T is non-negative (Jensen) and bounded by ln(n)
        assert -1e-6 <= out.loc[src, "theil_t"] <= np.log(len(v)) + 1e-6


def test_mix_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_mix_entropy

    out = d_mix_entropy(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    p = docs["source"].value_counts(normalize=True).to_numpy()
    h = float(-(p * np.log(p)).sum())
    assert int(out["n_sources"].iloc[0]) == len(p)
    assert int(out["n_docs"].iloc[0]) == len(docs)
    assert abs(out["entropy"].iloc[0] - h) < 5e-5
    assert abs(out["evenness"].iloc[0] - h / np.log(len(p))) < 5e-5
    # the +0.5005 micro-quantizer bias can push a near-uniform mixture
    # a few 1e-6 above exactly 1.0
    assert 0.0 <= out["evenness"].iloc[0] <= 1.0 + 1e-5


def test_time_to_event_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_time_to_event

    out = t_time_to_event(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    ev = ev.assign(t=us)
    signups = ev[ev["event_type"] == "signup"].groupby("user_id")["t"].min()
    assert set(out.index) == set(signups.index)
    n_conv = 0
    for uid, t0 in signups.items():
        later = ev[(ev["user_id"] == uid) & (ev["event_type"] == "purchase")
                   & (ev["t"] >= t0)]
        if len(later):
            assert not out.loc[uid, "censored"]
            assert int(out.loc[uid, "duration_us"]) == int(later["t"].min() - t0)
            n_conv += 1
        else:
            assert out.loc[uid, "censored"]
            assert np.isnan(out.loc[uid, "duration_us"])
    assert n_conv >= 1
