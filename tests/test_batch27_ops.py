"""Spectral coefficient / bootstrap CI / Jensen-Shannon divergence vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _dense_hourly():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    return np.bincount(h - lo, minlength=hi - lo + 1).astype(np.int64)


def test_spectral_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_spectral,
    )

    out = t_spectral(SF).iloc[0]
    y = _dense_hourly().astype(np.float64)
    n = len(y)
    t = np.arange(n)
    a = (y * np.cos(2 * np.pi * t / 24)).sum()
    b = (y * np.sin(2 * np.pi * t / 24)).sum()
    assert int(out["n_hours"]) == n
    assert abs(out["a"] - a) < 5e-2   # 24-entry micro trig table slack
    assert abs(out["b"] - b) < 5e-2
    amp = 2 * np.sqrt(a * a + b * b) / n
    assert abs(out["amplitude"] - amp) < 1e-4
    sst = ((y - y.mean()) ** 2).sum()
    assert abs(out["power_share"] - 2 * (a * a + b * b) / n / sst) < 1e-4
    assert 0.0 <= out["power_share"] <= 1.0 + 1e-9


def test_bootstrap_ci_properties(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_bootstrap_ci,
    )

    out = d_bootstrap_ci(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    for _, r in out.iterrows():
        g = docs.loc[docs["source"] == r["source"], "n_chars"]
        assert int(r["n"]) == len(g)
        assert abs(r["mean"] - g.mean()) < 5e-6
        # order and coverage sanity: lo <= mean-ish <= hi, and the CI
        # half-width is in the ballpark of the analytic standard error
        assert r["ci_lo"] <= r["ci_hi"]
        se = g.std(ddof=1) / np.sqrt(200)  # 200 draws per replicate
        assert r["ci_hi"] - r["ci_lo"] < 10 * se + 1e-9
        assert r["ci_hi"] - r["ci_lo"] > 0.1 * se
        # CI straddles the true mean for this fixture
        assert r["ci_lo"] - 5 * se <= g.mean() <= r["ci_hi"] + 5 * se


def test_bootstrap_ci_is_deterministic(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_bootstrap_ci,
    )

    a = d_bootstrap_ci(SF)
    b = d_bootstrap_ci(SF)
    pd.testing.assert_frame_equal(a, b)


def test_js_divergence_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_js_divergence,
    )

    out = d_js_divergence(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    corpus = Counter()
    per_src = {}
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update((t or "").split())
        per_src[src] = cnt
        corpus.update(cnt)
    n_c = sum(corpus.values())
    for src, cnt in per_src.items():
        n_a = sum(cnt.values())
        jsd = 0.0
        for tok, nc in corpus.items():
            p = cnt.get(tok, 0) / n_a
            c = nc / n_c
            m = (p + c) / 2
            if p > 0:
                jsd += 0.5 * p * np.log(p / m)
            jsd += 0.5 * c * np.log(c / m)
        assert int(out.loc[src, "n_tok"]) == n_a
        assert abs(out.loc[src, "jsd"] - jsd) < 5e-5
        assert -1e-9 <= out.loc[src, "jsd"] <= np.log(2) + 1e-9
