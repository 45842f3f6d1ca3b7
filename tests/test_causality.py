"""Pure-Python d-separation / Markov-blanket fallback: CI tests, IAMB
on known structures, and the fairexp causal-filter integration."""

import numpy as np
import pandas as pd
import pytest

from complexity_driven_feature_construction_ray.pipelines.causality import (
    builtin_causal_filter,
    chi2_sf,
    d_separation_filter,
    g_test_ci,
    markov_blanket,
)


class TestChi2:
    def test_known_critical_values(self):
        # textbook 5% critical values
        assert abs(chi2_sf(3.841, 1) - 0.05) < 2e-3
        assert abs(chi2_sf(5.991, 2) - 0.05) < 2e-3
        assert abs(chi2_sf(18.307, 10) - 0.05) < 2e-3

    def test_extremes(self):
        assert chi2_sf(0.0, 3) == 1.0
        assert chi2_sf(1e4, 3) < 1e-10


class TestGTest:
    def test_independent_vars_accept(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 3, 4000)
        t = rng.integers(0, 2, 4000)
        _, p = g_test_ci(x, t)
        assert p > 0.05

    def test_dependent_vars_reject(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 3, 4000)
        t = (x + (rng.random(4000) < 0.1)).astype(np.int64) % 3
        _, p = g_test_ci(x, t)
        assert p < 1e-6

    def test_conditional_independence(self):
        # x -> z -> t: dependent marginally, independent given z
        rng = np.random.default_rng(1)
        x = rng.integers(0, 2, 6000)
        z = (x + (rng.random(6000) < 0.2)).astype(np.int64) % 2
        t = (z + (rng.random(6000) < 0.2)).astype(np.int64) % 2
        _, p_marg = g_test_ci(x, t)
        _, p_cond = g_test_ci(x, t, z.reshape(-1, 1))
        assert p_marg < 1e-6 and p_cond > 0.05


class TestMarkovBlanket:
    def test_known_structure(self):
        """A,B -> T (noisy-or); T -> C; D independent => MB(T) =
        {A, B, C}. (A pure-XOR parent pair would defeat any
        marginal-association grow step — the documented IAMB
        faithfulness caveat; bnlearn's score-based hc does not share
        it.)"""
        rng = np.random.default_rng(2)
        n = 8000
        a = rng.integers(0, 2, n)
        b = rng.integers(0, 2, n)
        t = (((a + b) >= 1) & (rng.random(n) < 0.9)).astype(np.int64)
        c = (t + (rng.random(n) < 0.1)).astype(np.int64) % 2
        d = rng.integers(0, 3, n)
        df = pd.DataFrame({"A": a, "B": b, "C": c, "D": d, "T": t})
        mb = markov_blanket(df, "T")
        assert set(mb) == {"A", "B", "C"}

    def test_mediated_sensitive_passes(self):
        """s -> x -> y (full mediation): s is NOT in MB(y)."""
        rng = np.random.default_rng(3)
        n = 6000
        s = rng.integers(0, 2, n)
        x = 2.0 * s + rng.normal(size=n)
        y = (x + 0.3 * rng.normal(size=n) > 1.0).astype(np.int64)
        df = pd.DataFrame({"x": x, "s": s, "outcome": y})
        ok, mb = d_separation_filter(df, ["s"], "outcome")
        assert ok and "x" in mb

    def test_direct_sensitive_fails(self):
        """y depends on s directly even given x: s IS in MB(y)."""
        rng = np.random.default_rng(4)
        n = 6000
        s = rng.integers(0, 2, n)
        x = rng.normal(size=n)
        y = (x + 3.0 * s + 0.3 * rng.normal(size=n) > 1.5).astype(np.int64)
        df = pd.DataFrame({"x": x, "s": s, "outcome": y})
        ok, mb = d_separation_filter(df, ["s"], "outcome")
        assert not ok and "s" in mb


def test_builtin_filter_vetoes_sensitive_derived_candidates():
    """The JCIT-shaped veto: candidates carrying sensitive information
    (a per-source group mean) fall; sensitive-independent ones pass."""
    rng = np.random.default_rng(5)
    n = 4000
    src = rng.choice(["web", "books", "code"], n)
    y = rng.integers(0, 2, n).astype(np.int8)
    n_tok = rng.integers(1, 512, n).astype(np.float64)
    filt = builtin_causal_filter()
    # log(n_tok) is independent of source
    assert filt("log(n_tok)", np.log(n_tok), y, src)
    # per-source mean IS a function of source
    means = pd.Series(n_tok).groupby(pd.Series(src)).transform("mean").to_numpy()
    assert not filt("mean(n_tok by source)", means, y, src)


def test_builtin_filter_in_lifecycle(ray_session):
    """fairexp_lifecycle runs end-to-end with the BUILT-IN executable
    causal filter (the R/bnlearn stand-in) instead of a user hook."""
    from complexity_driven_feature_construction_ray.pipelines.fairexp import (
        fairexp_lifecycle,
    )

    res = fairexp_lifecycle(
        2000, sample_rows=700, c_max=2,
        causal_filter=builtin_causal_filter(), use_ray=False,
    )
    assert res["selected"]
    assert 0.0 <= res["acc"] <= 1.0
    # the veto actually fired on sensitive-derived candidates (the c=2
    # layer contains gbt-by-source features) and they never reach SFFS
    assert res["dropped_causal"]
    assert not any("by source" in s for s in res["backfilled"])
