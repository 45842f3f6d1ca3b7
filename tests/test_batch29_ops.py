"""Cramér's V / Fano factor / time-decayed mean vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cramers_v_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cramers_v,
    )

    out = q_cramers_v(SF).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    piv = pd.crosstab(docs["lang"], docs["source"]).to_numpy(np.float64)
    n = piv.sum()
    e = piv.sum(1, keepdims=True) * piv.sum(0, keepdims=True) / n
    chi2 = ((piv - e) ** 2 / e).sum()
    r, c = piv.shape
    v = np.sqrt(chi2 / (n * (min(r, c) - 1)))
    assert int(out["n"]) == int(n)
    assert int(out["n_lang"]) == r and int(out["n_source"]) == c
    assert abs(out["chi2"] - chi2) < 5e-3
    assert abs(out["cramers_v"] - v) < 5e-5
    assert 0.0 <= out["cramers_v"] <= 1.0 + 1e-9


def test_fano_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_fano

    out = t_fano(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    for et in ev["event_type"].unique():
        y = np.bincount(h[ev["event_type"].to_numpy() == et] - lo,
                        minlength=H).astype(np.float64)
        assert int(out.loc[et, "n_hours"]) == H
        assert int(out.loc[et, "total"]) == int(y.sum())
        assert abs(out.loc[et, "mean"] - y.mean()) < 5e-6
        assert abs(out.loc[et, "var"] - y.var(ddof=1)) < 5e-6
        assert abs(out.loc[et, "fano"] - y.var(ddof=1) / y.mean()) < 5e-5
        assert out.loc[et, "fano"] >= 0.0


def test_decayed_mean_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_decayed_mean,
    )

    out = t_decayed_mean(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    t_end = int(us.max())
    WEEK = 7 * 24 * 3_600_000_000
    k = np.minimum((t_end - us) // WEEK, 16)
    w = (2.0 ** (16 - k))
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    for et, g in ev.assign(w=w, c=cents).groupby("event_type"):
        ref = (g["c"] * g["w"]).sum() / g["w"].sum() / 100
        assert abs(out.loc[et, "decayed_mean"] - ref) < 5e-6
        # recency weighting pulls toward late values more than uniform:
        # the decayed mean stays within the value range
        assert g["c"].min() / 100 - 1e-9 <= out.loc[et, "decayed_mean"] \
            <= g["c"].max() / 100 + 1e-9
    # exact integer folds roundtrip: num/den are consistent
    for et, r in out.iterrows():
        assert abs(r["num"] / r["den"] / 100 - r["decayed_mean"]) < 1e-6
