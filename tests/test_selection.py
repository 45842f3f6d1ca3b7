"""Feature-selection wrapper analogs (RFE / SelectKBest-MI / Boruta /
ReliefF) on a fixture with known-informative features."""

import numpy as np
import pytest

from complexity_driven_feature_construction_ray.pipelines.selection import (
    boruta_select,
    relieff_select,
    rfe_select,
    select_k_best_mi,
)


@pytest.fixture(scope="module")
def fixture():
    """y depends on f0 (linear) and f1 (linear, weaker); f2..f5 are
    pure noise."""
    rng = np.random.default_rng(11)
    n = 800
    X = rng.normal(size=(n, 6))
    logit = 2.5 * X[:, 0] + 1.5 * X[:, 1] + 0.3 * rng.normal(size=n)
    y = (logit > 0).astype(np.int8)
    names = [f"f{j}" for j in range(6)]
    return X, names, y


class TestSelectors:
    def test_rfe_keeps_informative(self, fixture):
        X, names, y = fixture
        kept = rfe_select(X, names, y, n_select=2)
        assert kept == ["f0", "f1"]

    def test_rfe_step_and_order(self, fixture):
        X, names, y = fixture
        kept = rfe_select(X, names, y, n_select=3, step=2)
        assert "f0" in kept and "f1" in kept and len(kept) == 3
        # survivors preserve input order
        assert kept == sorted(kept, key=names.index)

    def test_select_k_best_mi(self, fixture):
        X, names, y = fixture
        kept = select_k_best_mi(X, names, y, k=2)
        assert kept == ["f0", "f1"]

    def test_boruta_accepts_informative_rejects_noise(self, fixture):
        X, names, y = fixture
        res = boruta_select(X, names, y, n_trials=16)
        assert "f0" in res["accepted"] and "f1" in res["accepted"]
        assert not any(f in res["accepted"] for f in ("f2", "f3", "f4", "f5"))
        # partition property
        all_back = res["accepted"] + res["tentative"] + res["rejected"]
        assert sorted(all_back) == sorted(names)

    def test_relieff_ranks_informative(self, fixture):
        X, names, y = fixture
        kept = relieff_select(X, names, y, k=2, sample=300)
        assert kept == ["f0", "f1"]

    def test_deterministic(self, fixture):
        X, names, y = fixture
        assert boruta_select(X, names, y, n_trials=8) == boruta_select(
            X, names, y, n_trials=8
        )
        assert relieff_select(X, names, y, k=3) == relieff_select(X, names, y, k=3)
