"""Feature-selection wrapper analogs.

The reference ships thin sklearn/boruta/skrebate adapters used in its
side experiments (transformations/feature_selection/
FeatureEliminationTransformer.py = RFE, SelectKBestTransformer.py =
SelectKBest(mutual_info_classif), BorutaTransformer.py = BorutaPy over
an RF, skrebateTransformer.py = ReliefF). None of those libraries exist
in this environment, so each selector is an independent numpy
re-derivation operating on the DRIVER-SIDE scored-candidate /
backfilled sample table — selection is O(candidates × sample), tiny
next to the distributed backfill, exactly like the engine's own
SFFS/Pareto/AICc/NSGA-II drivers (SURVEY.md §1.5: the data is big, the
plan is small). The heavy per-feature materialization that feeds these
selectors is the distributed backfill.
"""

from __future__ import annotations

import numpy as np

from .model import LogisticRegressionNumpy, _standardize


def _sanitize(X: np.ndarray) -> np.ndarray:
    return np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0, posinf=0.0, neginf=0.0)


def _coef_importance(X: np.ndarray, y: np.ndarray, max_iter: int = 25) -> np.ndarray:
    """|standardized logistic coefficient| per feature — the linear-
    estimator importance RFE uses (sklearn RFE ranks by |coef_|)."""
    Xs, _ = _standardize(X, X)
    m = LogisticRegressionNumpy(max_iter=max_iter).fit(Xs, y)
    return np.abs(m.coef_[:-1])


def rfe_select(
    X: np.ndarray,
    names: list[str],
    y: np.ndarray,
    *,
    n_select: int = 5,
    step: int = 1,
    max_iter: int = 25,
) -> list[str]:
    """Recursive feature elimination (reference
    FeatureEliminationTransformer.py: sklearn.feature_selection.RFE):
    fit, drop the `step` weakest features by |coef|, repeat until
    n_select remain. Returns surviving names in input order."""
    X = _sanitize(X)
    alive = np.arange(X.shape[1])
    while len(alive) > n_select:
        imp = _coef_importance(X[:, alive], y, max_iter)
        k = min(step, len(alive) - n_select)
        drop = np.argsort(imp, kind="stable")[:k]
        alive = np.delete(alive, drop)
    return [names[i] for i in alive]


def select_k_best_mi(
    X: np.ndarray, names: list[str], y: np.ndarray, *, k: int = 5, bins: int = 10
) -> list[str]:
    """SelectKBest(mutual_info_classif) analog (reference
    SelectKBestTransformer.py) using the engine's histogram MI
    estimator. Returns the top-k names in input order."""
    from .fairexp import mutual_information

    X = _sanitize(X)
    mi = np.array([mutual_information(X[:, j], y, bins=bins) for j in range(X.shape[1])])
    top = np.sort(np.argsort(-mi, kind="stable")[:k])
    return [names[i] for i in top]


def boruta_select(
    X: np.ndarray,
    names: list[str],
    y: np.ndarray,
    *,
    n_trials: int = 20,
    alpha: float = 0.05,
    max_iter: int = 25,
    seed: int = 42,
) -> dict[str, list[str]]:
    """Boruta-style all-relevant selection (reference
    BorutaTransformer.py: BorutaPy over a RandomForest). Shadow features
    are per-trial permuted copies; a trial is a "hit" for feature j when
    its importance beats the best shadow's. Accept/reject by a two-sided
    binomial test against p=0.5 over n_trials (normal approximation —
    the same decision rule BorutaPy applies to RF importances); the
    importance here is the |standardized logistic coef| the rest of the
    engine scores with. Returns {"accepted", "tentative", "rejected"}."""
    X = _sanitize(X)
    rng = np.random.default_rng(seed)
    n, p = X.shape
    hits = np.zeros(p, dtype=np.int64)
    for _ in range(n_trials):
        # each shadow column permuted independently (breaks cross-column
        # correlation too, as BorutaPy does)
        shadow = np.column_stack([X[rng.permutation(n), j] for j in range(p)])
        imp = _coef_importance(np.hstack([X, shadow]), y, max_iter)
        hits += imp[:p] > imp[p:].max()
    # normal approx of Binomial(n_trials, 0.5); z_crit one-sided per tail
    from math import erf, sqrt

    def sf(z):  # P(Z > z)
        return 0.5 * (1.0 - erf(z / sqrt(2.0)))

    mu, sd = n_trials * 0.5, sqrt(n_trials * 0.25)
    z = (hits - mu) / sd
    accepted = [names[j] for j in range(p) if sf(z[j]) < alpha]
    rejected = [names[j] for j in range(p) if sf(-z[j]) < alpha]
    tentative = [n_ for n_ in names if n_ not in accepted and n_ not in rejected]
    return {"accepted": accepted, "tentative": tentative, "rejected": rejected}


def relieff_select(
    X: np.ndarray,
    names: list[str],
    y: np.ndarray,
    *,
    k: int = 5,
    n_neighbors: int = 10,
    sample: int | None = 500,
    seed: int = 42,
) -> list[str]:
    """ReliefF analog (reference skrebateTransformer.py:
    ReliefF(n_neighbors=100)). For each sampled instance, find its
    n_neighbors nearest hits (same class) and misses (other class) and
    score each feature by mean |diff to miss| - |diff to hit|, range-
    normalized. Distances and per-feature diffs are full numpy
    broadcasts — no per-feature Python loop. Returns top-k names in
    input order."""
    X = _sanitize(X)
    rng = np.random.default_rng(seed)
    n, p = X.shape
    rng_span = X.max(axis=0) - X.min(axis=0)
    rng_span[rng_span == 0] = 1.0
    Xn = X / rng_span
    idx = rng.choice(n, size=min(sample or n, n), replace=False)
    score = np.zeros(p)
    y = np.asarray(y)
    for i in idx:
        d = np.abs(Xn - Xn[i]).sum(axis=1)  # L1 in normalized space
        d[i] = np.inf
        same = y == y[i]
        hit_pool = np.flatnonzero(same)
        miss_pool = np.flatnonzero(~same)
        if len(hit_pool) == 0 or len(miss_pool) == 0:
            continue
        hits = hit_pool[np.argsort(d[hit_pool], kind="stable")[:n_neighbors]]
        misses = miss_pool[np.argsort(d[miss_pool], kind="stable")[:n_neighbors]]
        score += np.abs(Xn[misses] - Xn[i]).mean(axis=0)
        score -= np.abs(Xn[hits] - Xn[i]).mean(axis=0)
    top = np.sort(np.argsort(-score, kind="stable")[:k])
    return [names[i] for i in top]
