"""Numpy scoring model: L2 logistic regression + stratified CV.

The reference scores candidates with sklearn LogisticRegression under a
C grid and f1-micro (reference ComplexityDrivenFeatureConstruction.py:
41-52, evaluation/run_evaluation.py:142-243). sklearn is not available
here, so the model is a small Newton/IRLS implementation — for binary
single-label data f1-micro equals accuracy, which is what `cv_score`
returns. Folds are deterministic stratified splits (seeded, mirroring
the reference's fixed seed 42 in EvaluationFramework.py:179).
"""

from __future__ import annotations

import numpy as np

C_GRID = (0.001, 0.01, 0.1, 1.0, 10.0, 100.0, 1000.0)


class LogisticRegressionNumpy:
    """Binary L2-regularized logistic regression via Newton iterations."""

    def __init__(self, C: float = 1.0, max_iter: int = 25, tol: float = 1e-6):
        self.C = C
        self.max_iter = max_iter
        self.tol = tol
        self.coef_: np.ndarray | None = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticRegressionNumpy":
        n, p = X.shape
        Xb = np.hstack([X, np.ones((n, 1))])
        w = np.zeros(p + 1)
        lam = 1.0 / self.C
        reg = lam * np.eye(p + 1)
        reg[-1, -1] = 0.0  # don't regularize the intercept
        for _ in range(self.max_iter):
            z = Xb @ w
            mu = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
            g = Xb.T @ (mu - y) + lam * np.r_[w[:-1], 0.0]
            s = np.maximum(mu * (1 - mu), 1e-9)
            H = (Xb * s[:, None]).T @ Xb + reg
            try:
                step = np.linalg.solve(H, g)
            except np.linalg.LinAlgError:
                step = np.linalg.lstsq(H, g, rcond=None)[0]
            w -= step
            if np.max(np.abs(step)) < self.tol:
                break
        self.coef_ = w
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Xb = np.hstack([X, np.ones((len(X), 1))])
        z = np.clip(Xb @ self.coef_, -35, 35)
        return 1.0 / (1.0 + np.exp(-z))

    def predict(self, X: np.ndarray) -> np.ndarray:
        return (self.predict_proba(X) >= 0.5).astype(np.int8)

    def log_likelihood(self, X: np.ndarray, y: np.ndarray) -> float:
        p = np.clip(self.predict_proba(X), 1e-12, 1 - 1e-12)
        return float(np.sum(y * np.log(p) + (1 - y) * np.log(1 - p)))


def stratified_folds(y: np.ndarray, k: int, seed: int = 42) -> np.ndarray:
    """Deterministic stratified fold ids in [0, k) per row."""
    rng = np.random.default_rng(seed)
    fold = np.empty(len(y), dtype=np.int32)
    for cls in np.unique(y):
        idx = np.nonzero(y == cls)[0]
        perm = rng.permutation(len(idx))
        fold[idx[perm]] = np.arange(len(idx)) % k
    return fold


def _standardize(train: np.ndarray, test: np.ndarray):
    mu = train.mean(axis=0)
    sd = train.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    return (train - mu) / sd, (test - mu) / sd


class LogisticRegressionOvR:
    """Multiclass logistic regression by one-vs-rest binary heads — the
    engine's stand-in for sklearn's multiclass LogisticRegression (the
    reference scores any label arity via sklearn; f1-micro equals
    accuracy for single-label multiclass, which cv_score returns)."""

    def __init__(self, C: float = 1.0, max_iter: int = 25):
        self.C = C
        self.max_iter = max_iter
        self.classes_: np.ndarray | None = None
        self.heads_: list[LogisticRegressionNumpy] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticRegressionOvR":
        self.classes_ = np.unique(y)
        self.heads_ = [
            LogisticRegressionNumpy(C=self.C, max_iter=self.max_iter).fit(
                X, (y == cls).astype(np.int8)
            )
            for cls in self.classes_
        ]
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """(n, k) class probabilities: OvR head scores normalized to 1."""
        raw = np.column_stack([h.predict_proba(X) for h in self.heads_])
        return raw / np.maximum(raw.sum(axis=1, keepdims=True), 1e-12)

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]

    def log_likelihood(self, X: np.ndarray, y: np.ndarray) -> float:
        p = self.predict_proba(X)
        k = len(self.classes_)
        col = np.clip(np.searchsorted(self.classes_, y), 0, k - 1)
        # a test label absent from the training fold (singleton class in
        # CV) has no head: floor its probability instead of silently
        # reading a neighboring class's column
        seen = self.classes_[col] == y
        pt = np.where(seen, p[np.arange(len(y)), col], 1e-12)
        return float(np.sum(np.log(np.clip(pt, 1e-12, 1.0))))


def cv_score(
    X: np.ndarray,
    y: np.ndarray,
    fold: np.ndarray,
    c_grid=C_GRID,
    max_iter: int = 25,
) -> tuple[float, float, float]:
    """Grid-searched CV accuracy (== f1-micro for single-label data,
    binary or multiclass — multiclass runs one-vs-rest heads).

    Returns (best mean test accuracy over the grid, best C, mean test
    log-likelihood at the best C). Non-finite feature values are
    sanitized to 0 for the linear model (the reference's constant/NaN
    kill happens before scoring; this is the belt-and-braces guard).
    """
    X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0, posinf=0.0, neginf=0.0)
    if X.ndim == 1:
        X = X[:, None]
    multiclass = len(np.unique(y)) > 2
    k = int(fold.max()) + 1
    best = (-1.0, 1.0, -np.inf)
    for C in c_grid:
        accs, lls = [], []
        for f in range(k):
            tr, te = fold != f, fold == f
            if y[tr].min() == y[tr].max():
                continue  # degenerate fold
            Xtr, Xte = _standardize(X[tr], X[te])
            cls = LogisticRegressionOvR if multiclass else LogisticRegressionNumpy
            m = cls(C=C, max_iter=max_iter).fit(Xtr, y[tr])
            accs.append(float((m.predict(Xte) == y[te]).mean()))
            lls.append(m.log_likelihood(Xte, y[te]))
        if accs:
            mean_acc = float(np.mean(accs))
            if mean_acc > best[0]:
                best = (mean_acc, C, float(np.mean(lls)))
    return best


def cnn_instance_selection(
    X: np.ndarray, y: np.ndarray, *, seed: int = 42, max_passes: int = 5
) -> np.ndarray:
    """Condensed Nearest Neighbour instance selection (Hart 1968) — the
    reference's optional `instance.selection` pre-step
    (EvaluationFramework.py:175-201 via imblearn
    CondensedNearestNeighbour, instance_selection/instance_selection_cnn.py).
    Returns the sorted row indices of the condensed set: one seed point
    per class, then every point misclassified by 1-NN against the
    current store joins it, repeated until a full pass adds nothing.
    Deterministic under `seed`. Distances are vectorized against the
    store; this runs on the driver-side search sample only."""
    X = np.nan_to_num(np.asarray(X, dtype=np.float64), nan=0.0, posinf=0.0, neginf=0.0)
    if X.ndim == 1:
        X = X[:, None]
    y = np.asarray(y)
    mu, sd = X.mean(axis=0), X.std(axis=0)
    Xs = (X - mu) / np.where(sd == 0, 1.0, sd)
    rng = np.random.default_rng(seed)
    n = len(y)
    store: list[int] = []
    for cls in np.unique(y):
        idx = np.flatnonzero(y == cls)
        store.append(int(rng.choice(idx)))
    order = rng.permutation(n)
    in_store = np.zeros(n, dtype=bool)
    in_store[store] = True
    for _ in range(max_passes):
        added = False
        S = Xs[store]
        Sy = y[store]
        for i in order:
            if in_store[i]:
                continue
            d = ((S - Xs[i]) ** 2).sum(axis=1)
            if Sy[np.argmin(d)] != y[i]:
                store.append(int(i))
                in_store[i] = True
                S = Xs[store]
                Sy = y[store]
                added = True
        if not added:
            break
    return np.sort(np.asarray(store))


def smote_oversample(
    X: np.ndarray,
    y: np.ndarray,
    *,
    k: int = 5,
    seed: int = 42,
    target_ratio: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """SMOTE minority oversampling (the reference's sampling wrapper,
    transformations/sampling/SmoteTransformation.py via imblearn SMOTE;
    re-implemented): synthesize minority samples by interpolating a
    random fraction of the way toward one of the k nearest minority
    neighbours until n_minority >= target_ratio * n_majority.
    Deterministic under `seed`; returns (X_aug, y_aug) with the
    synthetic rows appended. Runs on the driver-side sample (the
    reference applies it inside the sklearn pipeline on in-memory
    folds)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y)
    classes, counts = np.unique(y, return_counts=True)
    if len(classes) != 2:
        raise ValueError("smote_oversample expects binary labels")
    minority = classes[np.argmin(counts)]
    maj_n, min_n = counts.max(), counts.min()
    n_new = int(np.ceil(target_ratio * maj_n)) - min_n
    if n_new <= 0:
        return X, y
    Xm = X[y == minority]
    k_eff = min(k, len(Xm) - 1)
    if k_eff < 1:
        return X, y
    # pairwise distances within the minority class (driver sample scale)
    d2 = ((Xm[:, None, :] - Xm[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1, kind="stable")[:, :k_eff]
    rng = np.random.default_rng(seed)
    base = rng.integers(0, len(Xm), n_new)
    pick = nn[base, rng.integers(0, k_eff, n_new)]
    gap = rng.random((n_new, 1))
    X_new = Xm[base] + gap * (Xm[pick] - Xm[base])
    return (
        np.vstack([X, X_new]),
        np.concatenate([y, np.full(n_new, minority, dtype=y.dtype)]),
    )
