"""Complexity-driven candidate search (the engine proper).

Re-creates the reference's layered breadth-first search by complexity
budget (reference feature_selection/ComplexityDrivenFeatureConstruction.py:
381-685) Ray-Data-first:

- plan enumeration, sympy dedup, ε-gate, Pareto/AICc selection are
  driver-side (O(candidates), tiny — SURVEY.md §1.5: "the data is big,
  the plan is small")
- candidate SCORING is the heavy stage and runs on a dedicated scoring
  actor pool: a ray.data Dataset *of candidate plans* mapped through a
  stateful actor class that holds the (broadcast) scoring sample, fold
  ids and target once per actor (replacing the reference's fork-globals
  mp.Pool, run_evaluation.py:433-452 / my_globale_module.py:1-18)

Evaluation semantics per candidate mirror run_evaluation.py:247-398:
per-fold fit of stateful nodes on the train slice only, transform of
the test slice, grid-searched CV accuracy; constant-feature kill
(:287-290); exact value-dedup via a content hash of the per-fold
outputs (:292-298); the ε-pruning gate keeps a candidate iff its score
improves on the best parent by more than epsilon, with raw and one-hot
features always passing (:370-371).
"""

from __future__ import annotations

import hashlib
import pickle
import time
from dataclasses import dataclass, field

import numpy as np

from ..functions.expr import (
    BINARY_OPS,
    Feature,
    UNARY_OPS,
    binary,
    groupbythen,
    is_applicable,
    onehot,
    unary,
)
from ..functions.kernels import evaluate, fit_on_arrays
from ..functions.sympy_rules import canonical_key, canonical_sympy, is_constant_expr
from .model import C_GRID, cv_score, stratified_folds

DEFAULT_GBT_AGGS = ("max", "min", "mean", "std")  # reference feature_space/division.py:41-56

# The default producer (get_transformation_for_division, reference
# candidate_generation/feature_space/division.py:23-56): MinMaxScaling,
# MDLP-discretize (supervised), 1/x, -1*x, log, mean-impute; binary
# nansum/nanprod; GroupByThen{max,min,mean,std}. OneHot candidates are
# generated separately from categorical raws (as in the reference).
DIVISION_OPS = dict(
    unary_ops=("minmax", "mdlp", "reciprocal", "minus", "log", "impute_mean"),
    binary_ops=("add", "mul"),
    gbt_aggs=("max", "min", "mean", "std"),
)

# ExploreKit-style producer (get_transformation_for_feature_space,
# reference feature_space/explorekit_transformations.py:19-41):
# equal-width discretize(10) + MinMaxScaling; binary nansum/nanprod +
# divide/subtract; same GroupByThen family.
EXPLOREKIT_OPS = dict(
    unary_ops=("discretize", "minmax"),
    binary_ops=("add", "mul", "div", "sub"),
    gbt_aggs=("max", "min", "mean", "std"),
)

# TreeGenerator's hard-coded transformation set (reference
# candidate_generation/TreeGenerator.py:66-84): discretize(10) +
# MinMaxScaling; nansum/nanprod; divide/subtract; GroupByThen
# {max,min,mean,std} — the same families as the ExploreKit space.
TREE_OPS = dict(EXPLOREKIT_OPS)


@dataclass
class Scored:
    feature: Feature
    score: float
    best_C: float
    loglik: float
    name: str = ""
    side: dict | None = None  # AIC/BIC/consistency, see candidate_side_metrics

    def __post_init__(self):
        self.name = self.feature.name

    @property
    def complexity(self) -> int:
        return self.feature.complexity


@dataclass
class SearchResult:
    survivors: dict[int, list[Scored]]
    all_scored: dict[str, Scored]
    best: Scored
    pareto: list[Scored]
    aicc_selected: Scored
    stats: dict = field(default_factory=dict)

    def all_representations(self) -> list[Feature]:
        return [s.feature for layer in self.survivors.values() for s in layer]


def _eval_candidate(feat: Feature, cols, y, fold, c_grid, max_iter=25):
    """Per-fold fit/transform + grid CV; returns (score, C, loglik, vhash, const)."""
    k = int(fold.max()) + 1
    col_out = np.empty(len(y), dtype=np.float64)
    hasher = hashlib.blake2b(digest_size=16)
    for f in range(k):
        tr = fold != f
        cols_tr = {c: v[tr] for c, v in cols.items()}
        fitted = fit_on_arrays([feat], cols_tr, y=y[tr])
        te = ~tr
        cols_te = {c: v[te] for c, v in cols.items()}
        out_te = evaluate(feat, cols_te, fitted)
        col_out[te] = out_te
        hasher.update(np.round(np.nan_to_num(out_te, nan=-1e18), 10).tobytes())
    finite = col_out[np.isfinite(col_out)]
    if len(finite) == 0 or (len(finite) and finite.min() == finite.max()):
        return (0.0, 1.0, -np.inf, hasher.hexdigest(), True)
    score, best_c, ll = cv_score(col_out, y, fold, c_grid, max_iter)
    return (score, best_c, ll, hasher.hexdigest(), False)


_WORKER_COLS: dict = {}  # per-worker-process cache of the scoring sample
_SCORE_REMOTE = None  # lazily-created ray.remote wrapper (exported once)


def _cached_broadcast(wrapped_blob_ref):
    """Resolve the broadcast pickled sample through the per-worker-
    process cache — ONE deserialization per worker, however many tasks
    land on it. `wrapped_blob_ref` is a 1-tuple so Ray does not
    auto-resolve the ObjectRef before the task body runs. Shared by the
    scoring / nested-CV / side-metrics fan-outs."""
    import ray

    (blob_ref,) = wrapped_blob_ref
    key = blob_ref.hex()
    cols = _WORKER_COLS.get(key)
    if cols is None:
        if len(_WORKER_COLS) > 4:
            _WORKER_COLS.clear()
        cols = _WORKER_COLS[key] = pickle.loads(ray.get(blob_ref))
    return cols


def _install_ops(custom_ops):
    """Make the driver's registry snapshot AUTHORITATIVE in this worker
    process: warm Ray workers outlive a run, so stale entries from a
    previous run (same name, different implementation — or a name the
    new run expects absent) must not leak into candidate scoring."""
    from ..functions.expr import CUSTOM_OPS as _REG

    snap = custom_ops or {}
    for k in [k for k in _REG if k not in snap]:
        del _REG[k]
    _REG.update(snap)


def _score_chunk(wrapped_blob_ref, plan_blobs, y, fold, c_grid, max_iter, custom_ops):
    """Task-mode scoring kernel: the sample ships once via the object
    store and is deserialized once per WORKER PROCESS (module cache) —
    the same amortization as a dedicated actor without paying
    actor-process startup (see stages/backfill.py:_task_backfill for
    the measured gap). `wrapped_blob_ref` is a 1-tuple so Ray does not
    auto-resolve the ObjectRef before the task body runs."""
    _install_ops(custom_ops)
    cols = _cached_broadcast(wrapped_blob_ref)
    out = []
    for blob in plan_blobs:
        feat: Feature = pickle.loads(blob)
        try:
            r = _eval_candidate(feat, cols, y, fold, c_grid, max_iter)
        except Exception:
            # a failing candidate is dropped, not fatal (reference
            # run_evaluation.py:401-414 evaluate_catch)
            r = (0.0, 1.0, -np.inf, f"error:{feat.name}", True)
        out.append((feat.name, *r))
    return out


class CandidateScorer:
    """Scoring-pool actor: candidate plans in, scores out.

    The sample (base columns + target + fold ids) ships once per actor
    via constructor args — the Ray-native replacement for the
    reference's fork-inherited module globals."""

    def __init__(
        self,
        cols_blob: bytes,
        y: np.ndarray,
        fold: np.ndarray,
        c_grid,
        max_iter: int,
        custom_ops: dict | None = None,
    ):
        self.cols = pickle.loads(cols_blob)
        self.y = np.asarray(y)
        self.fold = np.asarray(fold)
        self.c_grid = tuple(c_grid)
        self.max_iter = max_iter
        if custom_ops:
            # user-registered ops live per-process: install the driver's
            # registry snapshot in this actor (specs ship via cloudpickle)
            from ..functions.expr import CUSTOM_OPS

            CUSTOM_OPS.update(custom_ops)

    def __call__(self, batch: dict) -> dict:
        names, scores, cs, lls, hashes, consts = [], [], [], [], [], []
        for blob in batch["plan"]:
            feat: Feature = pickle.loads(blob)
            try:
                s, c, ll, vh, const = _eval_candidate(
                    feat, self.cols, self.y, self.fold, self.c_grid, self.max_iter
                )
            except Exception:
                # a failing candidate is dropped, not fatal (reference
                # run_evaluation.py:401-414 evaluate_catch); marked
                # constant so the driver discards it
                s, c, ll, vh, const = 0.0, 1.0, -np.inf, f"error:{feat.name}", True
            names.append(feat.name)
            scores.append(s)
            cs.append(c)
            lls.append(ll)
            hashes.append(vh)
            consts.append(const)
        return {
            "name": np.array(names, dtype=object),
            "score": np.array(scores),
            "best_C": np.array(cs),
            "loglik": np.array(lls),
            "vhash": np.array(hashes, dtype=object),
            "const": np.array(consts),
        }


def multiple_cv_rescore(
    features: list[Feature],
    cols,
    y,
    *,
    repeats: int = 5,
    cv: int = 5,
    seed: int = 42,
    c_grid=None,
    max_iter: int = 25,
    use_ray: bool = True,
) -> dict[str, tuple[float, float]]:
    """Repeated-CV re-scoring of (top-k) candidates — the reference's
    multiple-CV stabilization pass (reference evaluation/
    multiple_cv_scikit.py): each candidate scored under `repeats`
    different stratified fold splits; returns name -> (mean, std) of the
    per-repeat scores. Fan-out is (candidate x repeat) Ray tasks over a
    broadcast sample."""
    from .model import C_GRID, stratified_folds

    c_grid = tuple(c_grid or C_GRID)
    y = np.asarray(y).astype(np.int8)
    folds = [stratified_folds(y, cv, seed + r) for r in range(repeats)]

    if use_ray and len(features) * repeats > 2:
        import ray

        from ..functions.expr import CUSTOM_OPS

        blob_ref = ray.put(pickle.dumps(cols))
        ops_snapshot = dict(CUSTOM_OPS)

        @ray.remote(num_cpus=1)
        def score_one(feat_blob, fold, _blob=blob_ref, _ops=ops_snapshot):
            # snapshot is AUTHORITATIVE in the warm worker (see
            # _install_ops): stale names from a previous run must not
            # leak into this run's candidate scoring
            _install_ops(_ops)
            c = pickle.loads(ray.get(_blob) if isinstance(_blob, ray.ObjectRef) else _blob)
            feat = pickle.loads(feat_blob)
            s, *_ = _eval_candidate(feat, c, y, fold, c_grid, max_iter)
            return feat.name, s

        refs = [
            score_one.remote(pickle.dumps(f), fold) for f in features for fold in folds
        ]
        results = ray.get(refs)
    else:
        results = []
        for f in features:
            for fold in folds:
                s, *_ = _eval_candidate(f, cols, y, fold, c_grid, max_iter)
                results.append((f.name, s))

    by_name: dict[str, list[float]] = {}
    for name, s in results:
        by_name.setdefault(name, []).append(s)
    return {
        name: (float(np.mean(v)), float(np.std(v))) for name, v in by_name.items()
    }


def _nested_cv_one(feat: Feature, cols, y, fold, c_grid, max_iter) -> tuple[float, float]:
    """Nested CV for one candidate (reference evaluation/
    nested_cv_scikit.py:run_nested_cross_validation, ~64-107): for each
    outer test fold, the inner folds rotate as validation to pick C by
    mean accuracy; the model (feature fit + LR) then refits on all
    non-test rows and scores the held-out test fold. Returns
    (mean, std) of the per-test-fold scores."""
    from .model import LogisticRegressionNumpy, _standardize

    k = int(fold.max()) + 1
    outer_scores = []
    for t in range(k):
        # inner grid search: every non-test fold serves as validation once
        per_c = {C: [] for C in c_grid}
        for v in range(k):
            if v == t:
                continue
            tr = (fold != t) & (fold != v)
            te = fold == v
            if y[tr].min() == y[tr].max():
                continue
            fitted = fit_on_arrays([feat], {c: a[tr] for c, a in cols.items()}, y=y[tr])
            x_tr = evaluate(feat, {c: a[tr] for c, a in cols.items()}, fitted)
            x_te = evaluate(feat, {c: a[te] for c, a in cols.items()}, fitted)
            Xtr, Xte = _standardize(
                np.nan_to_num(x_tr[:, None], nan=0.0, posinf=0.0, neginf=0.0),
                np.nan_to_num(x_te[:, None], nan=0.0, posinf=0.0, neginf=0.0),
            )
            for C in c_grid:
                m = LogisticRegressionNumpy(C=C, max_iter=max_iter).fit(Xtr, y[tr])
                per_c[C].append(float((m.predict(Xte) == y[te]).mean()))
        best_C = max(c_grid, key=lambda C: np.mean(per_c[C]) if per_c[C] else -1.0)
        # refit feature + model on everything outside the test fold
        tr, te = fold != t, fold == t
        fitted = fit_on_arrays([feat], {c: a[tr] for c, a in cols.items()}, y=y[tr])
        x_tr = evaluate(feat, {c: a[tr] for c, a in cols.items()}, fitted)
        x_te = evaluate(feat, {c: a[te] for c, a in cols.items()}, fitted)
        Xtr, Xte = _standardize(
            np.nan_to_num(x_tr[:, None], nan=0.0, posinf=0.0, neginf=0.0),
            np.nan_to_num(x_te[:, None], nan=0.0, posinf=0.0, neginf=0.0),
        )
        m = LogisticRegressionNumpy(C=best_C, max_iter=max_iter).fit(Xtr, y[tr])
        outer_scores.append(float((m.predict(Xte) == y[te]).mean()))
    return float(np.mean(outer_scores)), float(np.std(outer_scores))


def nested_cv_rescore(
    features: list[Feature],
    cols,
    y,
    *,
    cv: int = 5,
    seed: int = 42,
    c_grid=None,
    max_iter: int = 25,
    use_ray: bool = True,
) -> dict[str, tuple[float, float]]:
    """Nested-CV re-scoring of (top-k) candidates — the reference's
    nested_cv pass (evaluation/nested_cv_scikit.py; there with 20 outer
    folds, here parameterized). One Ray task per candidate over the
    broadcast sample; returns name -> (mean, std) of outer-fold
    scores."""
    from .model import C_GRID, stratified_folds

    c_grid = tuple(c_grid or C_GRID)
    y = np.asarray(y).astype(np.int8)
    fold = stratified_folds(y, cv, seed)

    def safe_one(feat, c):
        # a candidate whose refit fails on some slice (e.g. MDLP finding
        # no cut) scores (0.0, 0.0), as in the reference's except branch
        # (nested_cv_scikit.py:107-110) — never aborts the pass
        try:
            return _nested_cv_one(feat, c, y, fold, c_grid, max_iter)
        except Exception:
            return (0.0, 0.0)

    if use_ray and len(features) > 1:
        import ray

        from ..functions.expr import CUSTOM_OPS

        blob_ref = ray.put(pickle.dumps(cols))
        ops_snapshot = dict(CUSTOM_OPS) or None

        @ray.remote(num_cpus=1)
        def nested_one(feat_blob, _blob=blob_ref, _ops=ops_snapshot):
            _install_ops(_ops)
            c = _cached_broadcast((_blob,))
            feat = pickle.loads(feat_blob)
            return feat.name, safe_one(feat, c)

        return dict(ray.get([nested_one.remote(pickle.dumps(f)) for f in features]))
    return {f.name: safe_one(f, cols) for f in features}


def candidate_side_metrics(
    feat: Feature, cols, y, fold, best_C: float = 1.0, max_iter: int = 25
) -> dict:
    """Per-candidate side metrics (reference evaluation/
    run_evaluation.py:85-138 + 196-204): out-of-fold probability
    predictions at the candidate's best C give an RSS, from which AIC /
    AICc / BIC are computed on BOTH k definitions — k=1 (feature count
    of the single constructed column, `*_k1`) and k=expression
    complexity (`*_kc`) — plus the label-consistency ratio
    (calculate_consistency, :118-138): the fraction of rows whose
    feature value maps to a single label."""
    from .model import LogisticRegressionNumpy, _standardize

    y = np.asarray(y).astype(np.int8)
    k = int(fold.max()) + 1
    col_out = np.empty(len(y), dtype=np.float64)
    p_out = np.empty(len(y), dtype=np.float64)
    for f in range(k):
        tr, te = fold != f, fold == f
        fitted = fit_on_arrays([feat], {c: a[tr] for c, a in cols.items()}, y=y[tr])
        x_tr = evaluate(feat, {c: a[tr] for c, a in cols.items()}, fitted)
        x_te = evaluate(feat, {c: a[te] for c, a in cols.items()}, fitted)
        col_out[te] = x_te
        Xtr, Xte = _standardize(
            np.nan_to_num(x_tr[:, None], nan=0.0, posinf=0.0, neginf=0.0),
            np.nan_to_num(x_te[:, None], nan=0.0, posinf=0.0, neginf=0.0),
        )
        m = LogisticRegressionNumpy(C=best_C, max_iter=max_iter).fit(Xtr, y[tr])
        p_out[te] = m.predict_proba(Xte)

    n = len(y)
    rss = float(np.sum((y - p_out) ** 2))

    def ic(kk: int) -> tuple[float, float, float]:
        base = n * np.log(max(rss, 1e-300) / n)
        aic = 2 * kk + base
        bic = np.log(n) * kk + base
        aicc = aic + (2 * kk * (kk + 1)) / (n - kk - 1) if n - kk - 1 > 0 else np.inf
        return float(aic), float(bic), float(aicc)

    aic1, bic1, aicc1 = ic(1)
    kc = feat.complexity
    aicc_, bicc_, aiccc_ = ic(kc)

    # label consistency of the materialized column (exact value -> label)
    import pandas as pd

    s = pd.Series(col_out)
    nun = pd.Series(y).groupby(s).nunique()
    inconsistent = set(nun[nun > 1].index)
    consistency = float((~s.isin(inconsistent)).mean())
    return {
        "rss": rss,
        "aic_k1": aic1,
        "bic_k1": bic1,
        "aicc_k1": aicc1,
        "aic_kc": aicc_,
        "bic_kc": bicc_,
        "aicc_kc": aiccc_,
        "consistency": consistency,
    }


def compute_side_metrics(
    scored: list[Scored],
    cols,
    y,
    *,
    cv: int = 5,
    seed: int = 42,
    max_iter: int = 25,
    use_ray: bool = True,
) -> list[Scored]:
    """Attach side metrics to each Scored (fan-out: one Ray task per
    candidate over a broadcast sample); returns the same objects."""
    from .model import stratified_folds

    y = np.asarray(y).astype(np.int8)
    fold = stratified_folds(y, cv, seed)
    _NAN_SIDE = {
        k: float("nan")
        for k in ("rss", "aic_k1", "bic_k1", "aicc_k1", "aic_kc", "bic_kc", "aicc_kc", "consistency")
    }

    def safe_side(feat, c, best_C):
        try:
            return candidate_side_metrics(feat, c, y, fold, best_C, max_iter)
        except Exception:  # drop-not-crash, as in the scoring fan-out
            return dict(_NAN_SIDE)

    if use_ray and len(scored) > 1:
        import ray

        from ..functions.expr import CUSTOM_OPS

        blob_ref = ray.put(pickle.dumps(cols))
        ops_snapshot = dict(CUSTOM_OPS) or None

        @ray.remote(num_cpus=1)
        def side_one(feat_blob, best_C, _blob=blob_ref, _ops=ops_snapshot):
            _install_ops(_ops)
            c = _cached_broadcast((_blob,))
            feat = pickle.loads(feat_blob)
            return feat.name, safe_side(feat, c, best_C)

        got = dict(
            ray.get([side_one.remote(pickle.dumps(s.feature), s.best_C) for s in scored])
        )
    else:
        got = {s.name: safe_side(s.feature, cols, s.best_C) for s in scored}
    for s in scored:
        s.side = got[s.name]
    return scored


def pareto_front(scored: list[Scored]) -> list[Scored]:
    """Non-dominated (max score, min complexity) set, one per complexity."""
    best_at: dict[int, Scored] = {}
    for s in scored:
        cur = best_at.get(s.complexity)
        if cur is None or s.score > cur.score:
            best_at[s.complexity] = s
    front: list[Scored] = []
    best_seen = -np.inf
    for c in sorted(best_at):
        if best_at[c].score > best_seen:
            front.append(best_at[c])
            best_seen = best_at[c].score
    return front


def aicc_select(champions: list[Scored], n: int) -> Scored:
    """AICc over per-complexity champions (reference
    ComplexityDrivenFeatureConstruction.py:754-798): k = expression
    complexity, LL = held-out log-likelihood at the champion's best C."""
    best, best_v = None, np.inf
    for s in champions:
        k = s.complexity
        if n - k - 1 <= 0 or not np.isfinite(s.loglik):
            continue
        v = -2.0 * s.loglik + 2 * k + (2.0 * k * (k + 1)) / (n - k - 1)
        if v < best_v:
            best, best_v = s, v
    return best if best is not None else max(champions, key=lambda s: s.score)


class ComplexityDrivenSearch:
    def __init__(
        self,
        c_max: int | None = 3,
        epsilon: float = 0.0,
        cv: int = 5,
        seed: int = 42,
        c_grid=C_GRID,
        gbt_aggs=DEFAULT_GBT_AGGS,
        unary_ops=DIVISION_OPS["unary_ops"],
        binary_ops=DIVISION_OPS["binary_ops"],
        max_seconds: float | None = None,
        hard_c_cap: int = 10,
        max_onehot_values: int = 20,
        scorer_concurrency: int | None = None,
        score_batch: int = 4,
        lr_max_iter: int = 25,
        use_ray: bool = True,
        instance_selection: bool = False,
        scorer_mode: str = "tasks",
        strategy: str = "layered",
        tree_depth: int = 3,
        tree_frontier_cap: int | None = None,
    ):
        # default op families = get_transformation_for_division
        # (reference candidate_generation/feature_space/division.py:23-56)
        self.c_max = c_max
        self.epsilon = epsilon
        self.cv = cv
        self.seed = seed
        self.c_grid = tuple(c_grid)
        self.gbt_aggs = tuple(gbt_aggs)
        self.unary_ops = tuple(unary_ops)
        self.binary_ops = tuple(binary_ops)
        self.max_seconds = max_seconds
        self.hard_c_cap = hard_c_cap
        self.max_onehot_values = max_onehot_values
        self.scorer_concurrency = scorer_concurrency
        self.score_batch = score_batch
        self.lr_max_iter = lr_max_iter
        self.use_ray = use_ray
        # reference Config 'instance.selection' (EvaluationFramework.py:
        # 193-199): condense the scoring sample by CNN before the search
        self.instance_selection = instance_selection
        # "tasks" (default): warm task pool + per-worker sample cache —
        # no actor startup on cold runs; "actors": dedicated pool (the
        # right shape if per-candidate state ever becomes heavy)
        self.scorer_mode = scorer_mode
        # "layered" = the reference's complexity-budget BFS;
        # "explorekit" = one-shot Fui/Foi/Foui enumeration
        # (candidate_generation/explorekit/Generator.py);
        # "tree" = TreeGenerator's depth-layered expansion over the
        # accumulated feature set (candidate_generation/TreeGenerator.py)
        self.strategy = strategy
        # tree strategy only: number of expansion rounds (reference
        # runs `for depth in range(3)`, TreeGenerator.py:138-140) and an
        # optional score-ranked cap on the accumulated frontier (the
        # reference is unbounded; a cap keeps depth-3 runs tractable on
        # wider schemas — None = faithful)
        self.tree_depth = tree_depth
        self.tree_frontier_cap = tree_frontier_cap
        self._pool = None
        self._actors: list = []
        self._blob_ref = None

    # -- scoring -------------------------------------------------------------

    def _score_layer(self, layer: list[Feature], cols, y, fold) -> list[tuple]:
        if not layer:
            return []
        if self.use_ray and len(layer) > 2:
            return self._score_ray(layer, cols, y, fold)
        out = []
        for f in layer:
            try:
                out.append(
                    (f,) + _eval_candidate(f, cols, y, fold, self.c_grid, self.lr_max_iter)
                )
            except Exception:  # semantic skip, as in the ray path
                out.append((f, 0.0, 1.0, -np.inf, f"error:{f.name}", True))
        return out

    def _ensure_pool(self, cols, y, fold, want: int):
        """Dedicated scoring actor pool, created on first use and grown on
        demand up to min(want, CPUs-1) — spinning up a full CPU-wide pool
        for a 10-chunk layer pays more in actor startup than the scoring
        costs. The sample ships once per actor through a shared ObjectRef."""
        import ray

        n_cpu = int(ray.cluster_resources().get("CPU", 4))
        cap = self.scorer_concurrency or max(2, n_cpu - 1)
        target = min(cap, max(2, want))
        if len(self._actors) >= target:
            if self._pool is None:
                self._pool = ray.util.ActorPool(self._actors)
            return self._pool
        if self._blob_ref is None:
            self._blob_ref = ray.put(pickle.dumps(cols))
        from ..functions.expr import CUSTOM_OPS

        Actor = ray.remote(num_cpus=1)(CandidateScorer)
        self._actors.extend(
            Actor.remote(
                self._blob_ref, y, fold, self.c_grid, self.lr_max_iter,
                dict(CUSTOM_OPS) or None,
            )
            for _ in range(target - len(self._actors))
        )
        self._pool = ray.util.ActorPool(self._actors)
        return self._pool

    def _score_ray(self, layer: list[Feature], cols, y, fold) -> list[tuple]:
        chunks = [
            layer[i : i + self.score_batch] for i in range(0, len(layer), self.score_batch)
        ]
        if self.scorer_mode == "tasks":
            import ray

            from ..functions.expr import CUSTOM_OPS

            if self._blob_ref is None:
                self._blob_ref = ray.put(pickle.dumps(cols))
            ops = dict(CUSTOM_OPS) or None
            global _SCORE_REMOTE
            if _SCORE_REMOTE is None:
                _SCORE_REMOTE = ray.remote(num_cpus=1)(_score_chunk)
            fn = _SCORE_REMOTE
            refs = [
                fn.remote(
                    (self._blob_ref,),
                    [pickle.dumps(f) for f in ch],
                    y,
                    fold,
                    self.c_grid,
                    self.lr_max_iter,
                    ops,
                )
                for ch in chunks
            ]
            by_name = {
                name: rest for out in ray.get(refs) for (name, *rest) in out
            }
            return [
                (f, float(r[0]), float(r[1]), float(r[2]), str(r[3]), bool(r[4]))
                for f in layer
                for r in (by_name[f.name],)
            ]
        pool = self._ensure_pool(cols, y, fold, want=len(chunks))
        batches = [
            {"plan": np.array([pickle.dumps(f) for f in ch], dtype=object)} for ch in chunks
        ]
        outs = list(pool.map(lambda a, b: a.__call__.remote(b), batches))
        by_name = {}
        for out in outs:
            for i in range(len(out["name"])):
                by_name[out["name"][i]] = tuple(
                    out[k][i] for k in ("score", "best_C", "loglik", "vhash", "const")
                )
        return [
            (f, float(r[0]), float(r[1]), float(r[2]), str(r[3]), bool(r[4]))
            for f in layer
            for r in (by_name[f.name],)
        ]

    def _shutdown_pool(self):
        if self._actors:
            import ray

            for a in self._actors:
                ray.kill(a)
        self._pool = None
        self._actors = []
        self._blob_ref = None

    @staticmethod
    def _harmonic_stop(champions: dict, survivors: dict, c: int) -> bool:
        pop = [s for k, v in survivors.items() if k <= c for s in v]
        total = len(pop)
        if total == 0 or any((c - h) not in champions for h in range(3)):
            return False

        def hm(champ: Scored) -> float:
            acc = sum(1 for s in pop if s.score <= champ.score) / total
            simp = sum(1 for s in pop if s.complexity >= champ.complexity) / total
            return (2 * simp * acc) / (simp + acc) if (simp + acc) else 0.0

        h0, h1, h2 = (hm(champions[c - h]) for h in range(3))
        return h2 >= h1 and h2 >= h0

    # -- enumeration ---------------------------------------------------------

    def _unary_candidates(self, parents: list[Feature]) -> list[Feature]:
        out = []
        for p in parents:
            for op in self.unary_ops:
                if op in UNARY_OPS and is_applicable(op, (p,)):
                    out.append(unary(op, p))
        return out

    def _binary_candidates(self, a_list: list[Feature], b_list: list[Feature]) -> list[Feature]:
        """Commutative ops pair combinations-with-replacement; order-matters
        ops pair all ordered pairs (reference Transformation.get_combinations,
        transformations/Transformation.py:72-83)."""
        out = []
        same = a_list is b_list
        for i, a in enumerate(a_list):
            for j, b in enumerate(b_list):
                for op in self.binary_ops:
                    commutative = op in ("add", "mul")
                    if commutative:
                        if same and j < i:
                            continue  # (a,b) == (b,a)
                        if is_applicable(op, (a, b)):
                            out.append(binary(op, a, b))
                    else:
                        if a.name == b.name:
                            continue
                        if is_applicable(op, (a, b)):
                            out.append(binary(op, a, b))
                        if not same and is_applicable(op, (b, a)):
                            out.append(binary(op, b, a))
        return out

    def _gbt_candidates(self, values: list[Feature], keys: list[Feature]) -> list[Feature]:
        out = []
        for v in values:
            for k in keys:
                if v.name == k.name:
                    continue
                for agg in self.gbt_aggs:
                    if is_applicable(f"gbt_{agg}", (v, k)):
                        out.append(groupbythen(agg, v, k))
        return out

    # -- the layered loop ----------------------------------------------------

    def run(self, cols: dict[str, np.ndarray], y: np.ndarray, base_features: list[Feature]) -> SearchResult:
        t0 = time.time()
        y = np.asarray(y).astype(np.int8)
        if self.instance_selection:
            from .model import cnn_instance_selection

            numeric = [
                f.params[0]
                for f in base_features
                if f.properties.get("type") == "numeric"
            ]
            if numeric:
                keep = cnn_instance_selection(
                    np.column_stack([np.asarray(cols[c], dtype=np.float64) for c in numeric]),
                    y,
                    seed=self.seed,
                )
                cols = {c: np.asarray(v)[keep] for c, v in cols.items()}
                y = y[keep]
        fold = stratified_folds(y, self.cv, self.seed)

        numeric_raws = [f for f in base_features if f.properties.get("type") == "numeric"]
        cat_raws = [f for f in base_features if f.properties.get("type") == "categorical"]
        clean_raws = [f for f in numeric_raws if not f.properties.get("missing_values")]
        parked = [f for f in numeric_raws if f.properties.get("missing_values")]

        seen_sympy: set[str] = set()
        seen_values: set[str] = set()
        scores: dict[str, float] = {f.name: 0.0 for f in parked}
        all_scored: dict[str, Scored] = {}
        survivors: dict[int, list[Scored]] = {}
        stats = {"enumerated": 0, "deduped_sympy": 0, "deduped_value": 0, "constant": 0, "pruned_eps": 0}

        def admit(cands: list[Feature]) -> list[Feature]:
            fresh = []
            for f in cands:
                stats["enumerated"] += 1
                expr = canonical_sympy(f)
                if is_constant_expr(expr):
                    stats["constant"] += 1
                    continue
                key = canonical_key(f)
                if key in seen_sympy:
                    stats["deduped_sympy"] += 1
                    continue
                seen_sympy.add(key)
                fresh.append(f)
            return fresh

        champions: dict[int, Scored] = {}  # best-so-far after each layer
        c_limit = self.c_max if self.c_max is not None else self.hard_c_cap
        try:
            if self.strategy == "explorekit":
                self._run_explorekit(
                    cols, y, fold, clean_raws, parked, cat_raws,
                    admit, survivors, all_scored, scores, seen_values, stats, champions,
                )
            elif self.strategy == "tree":
                self._run_tree(
                    cols, y, fold, clean_raws, parked, cat_raws,
                    admit, survivors, all_scored, scores, seen_values, stats, champions,
                )
            else:
                self._run_layers(
                    c_limit, t0, cols, y, fold, clean_raws, parked, cat_raws,
                    admit, survivors, all_scored, scores, seen_values, stats, champions,
                )
        finally:
            # a failed run must not leave a stale broadcast sample or a
            # live pool behind: a retry would silently score against the
            # previous run's columns
            self._shutdown_pool()
        flat = list(all_scored.values())
        best = max(flat, key=lambda s: s.score)
        front = pareto_front(flat)
        aicc = aicc_select(front, n=len(y))
        stats["seconds"] = time.time() - t0
        stats["scored"] = len(flat)
        return SearchResult(survivors, all_scored, best, front, aicc, stats)

    def _run_layers(
        self, c_limit, t0, cols, y, fold, clean_raws, parked, cat_raws,
        admit, survivors, all_scored, scores, seen_values, stats, champions,
    ):
        for c in range(1, c_limit + 1):
            if self.max_seconds is not None and time.time() - t0 > self.max_seconds:
                stats["deadline_hit"] = True
                break
            layer: list[Feature] = []
            if c == 1:
                layer = admit(list(clean_raws))
            else:
                prev = [s.feature for s in survivors.get(c - 1, [])]
                un_parents = prev + (parked if c == 2 else [])
                layer += admit(self._unary_candidates(un_parents))
                if c == 2:
                    for cf in cat_raws:
                        vals = cf.properties.get("values") or []
                        layer += admit(
                            [onehot(cf, v) for v in vals[: self.max_onehot_values]]
                        )
                # binary over 2-partitions of c-1 (reference :422-461)
                for c1 in range(1, (c - 1) // 2 + 1):
                    c2 = c - 1 - c1
                    if c2 < c1:
                        continue
                    a = [s.feature for s in survivors.get(c1, [])]
                    b = a if c1 == c2 else [s.feature for s in survivors.get(c2, [])]
                    layer += admit(self._binary_candidates(a, b))
                # gbt: value complexity + key complexity + 1 == c
                keys = cat_raws + [
                    s.feature
                    for lv in survivors.values()
                    for s in lv
                    if s.feature.op in ("discretize", "mdlp")
                ]
                for key_f in keys:
                    cv_needed = c - 1 - key_f.complexity
                    if cv_needed >= 1 and cv_needed in survivors:
                        layer += admit(
                            self._gbt_candidates(
                                [s.feature for s in survivors[cv_needed]], [key_f]
                            )
                        )

            results = self._score_layer(layer, cols, y, fold)
            kept: list[Scored] = []
            for f, score, best_c, ll, vhash, const in results:
                if const:
                    stats["constant"] += 1
                    continue
                if vhash in seen_values:
                    stats["deduped_value"] += 1
                    continue
                seen_values.add(vhash)
                sc = Scored(f, score, best_c, ll)
                all_scored[f.name] = sc
                scores[f.name] = score
                always_pass = f.op in ("raw", "onehot")
                parent_best = max(
                    (scores.get(p.name, 0.0) for p in f.parents), default=0.0
                )
                if always_pass or score - parent_best > self.epsilon:
                    kept.append(sc)
                else:
                    stats["pruned_eps"] += 1
            if kept:
                survivors[c] = kept
            if all_scored:
                champions[c] = max(all_scored.values(), key=lambda s: s.score)

            # harmonic-mean stop (c_max=None mode, reference
            # ComplexityDrivenFeatureConstruction.py:266-318,660-676):
            # stop when the 2-layer-old champion's harmonic mean of
            # P(score <= champ) and P(complexity >= champ) dominates.
            if self.c_max is None and c > 2 and self._harmonic_stop(champions, survivors, c):
                stats["harmonic_stop"] = c
                break

    def _run_explorekit(
        self, cols, y, fold, clean_raws, parked, cat_raws,
        admit, survivors, all_scored, scores, seen_values, stats, champions,
    ):
        """ExploreKit's one-shot enumeration instead of the layered
        complexity loop: Fui / Foi / Foui generated up front (reference
        candidate_generation/explorekit/Generator.py:27-94), scored in a
        single pass. No ε-parent gate — ExploreKit ranks candidates
        standalone; the engine's constant/sympy/value dedup still
        applies."""
        fi = clean_raws + parked + cat_raws
        layer = admit(list(fi)) + admit(
            explorekit_generate(
                fi,
                unary_ops=tuple(op for op in self.unary_ops if op in UNARY_OPS),
                commutative_ops=tuple(op for op in self.binary_ops if op in ("add", "mul")),
                ordered_ops=tuple(op for op in self.binary_ops if op in ("div", "sub")),
                gbt_aggs=self.gbt_aggs,
            )
        )
        results = self._score_layer(layer, cols, y, fold)
        for f, score, best_c, ll, vhash, const in results:
            if const:
                stats["constant"] += 1
                continue
            if vhash in seen_values:
                stats["deduped_value"] += 1
                continue
            seen_values.add(vhash)
            sc = Scored(f, score, best_c, ll)
            all_scored[f.name] = sc
            scores[f.name] = score
            survivors.setdefault(f.complexity, []).append(sc)
        if all_scored:
            champions[1] = max(all_scored.values(), key=lambda s: s.score)

    def _run_tree(
        self, cols, y, fold, clean_raws, parked, cat_raws,
        admit, survivors, all_scored, scores, seen_values, stats, champions,
    ):
        """TreeGenerator's depth-layered BFS (reference
        candidate_generation/TreeGenerator.py:62-143): F[0] = the raw
        features; layer d+1 applies EVERY transformation to ALL features
        accumulated in F[0..d] (generate_in_parallel fans out per
        transformation over chain(*F)), for tree_depth expansion rounds.
        The reference enumerates without score pruning (materialize only
        reports transform failures); here each layer runs through the
        engine's shared constant/sympy/value dedup and the scoring pool
        so the result table has the same shape as the other strategies.
        No ε-parent gate, matching the reference."""
        fi = clean_raws + parked + cat_raws
        frontier = admit(list(fi))
        accumulated: list[Feature] = []
        for d in range(self.tree_depth + 1):
            results = self._score_layer(frontier, cols, y, fold)
            for f, score, best_c, ll, vhash, const in results:
                if const:
                    stats["constant"] += 1
                    continue
                if vhash in seen_values:
                    stats["deduped_value"] += 1
                    continue
                seen_values.add(vhash)
                sc = Scored(f, score, best_c, ll)
                all_scored[f.name] = sc
                scores[f.name] = score
                survivors.setdefault(f.complexity, []).append(sc)
                accumulated.append(f)
            if all_scored:
                champions[d + 1] = max(all_scored.values(), key=lambda s: s.score)
            if d == self.tree_depth:
                break
            pool = accumulated
            if self.tree_frontier_cap is not None and len(pool) > self.tree_frontier_cap:
                ranked = sorted(
                    (all_scored[f.name] for f in pool), key=lambda s: -s.score
                )
                pool = [s.feature for s in ranked[: self.tree_frontier_cap]]
            frontier = admit(
                tree_expand(
                    pool,
                    unary_ops=tuple(op for op in self.unary_ops if op in UNARY_OPS),
                    commutative_ops=tuple(
                        op for op in self.binary_ops if op in ("add", "mul")
                    ),
                    ordered_ops=tuple(
                        op for op in self.binary_ops if op in ("div", "sub")
                    ),
                    gbt_aggs=self.gbt_aggs,
                )
            )


def tree_expand(
    feats: list[Feature],
    *,
    unary_ops: tuple = TREE_OPS["unary_ops"],
    commutative_ops: tuple = ("add", "mul"),
    ordered_ops: tuple = ("div", "sub"),
    gbt_aggs: tuple = DEFAULT_GBT_AGGS,
) -> list[Feature]:
    """One TreeGenerator expansion step: every transformation applied to
    the whole accumulated feature set, transformation-major (reference
    TreeGenerator.py:46-53 generate_for_transformation over the
    transformations list built at :66-84 — unaries first, then
    nansum/nanprod, then divide/subtract, then GroupByThen). Pair
    semantics follow Transformation.get_combinations
    (transformations/Transformation.py:72-83): combinations WITH
    replacement for commutative ops, ordered pairs without repetition
    for binary and (value, key) GroupByThen. Applicability runs this
    engine's predicates (functions/expr.py:is_applicable)."""
    from itertools import combinations_with_replacement, permutations

    out: list[Feature] = []
    for op in unary_ops:
        for p in feats:
            if is_applicable(op, (p,)):
                out.append(unary(op, p))
    for op in commutative_ops:
        for a, b in combinations_with_replacement(feats, 2):
            if is_applicable(op, (a, b)):
                out.append(binary(op, a, b))
    for op in ordered_ops:
        for a, b in permutations(feats, 2):
            if is_applicable(op, (a, b)):
                out.append(binary(op, a, b))
    for agg in gbt_aggs:
        for v, k in permutations(feats, 2):
            if is_applicable(f"gbt_{agg}", (v, k)):
                out.append(groupbythen(agg, v, k))
    return out


def explorekit_generate(
    base_features: list[Feature],
    *,
    unary_ops: tuple = ("discretize", "minmax"),
    commutative_ops: tuple = ("add", "mul"),
    ordered_ops: tuple = ("div", "sub"),
    gbt_aggs: tuple = DEFAULT_GBT_AGGS,
    include_raw: bool = False,
) -> list[Feature]:
    """ExploreKit's enumeration order (reference candidate_generation/
    explorekit/Generator.py:27-94 with the op families of
    feature_space/explorekit_transformations.py:19-41), over this
    engine's feature algebra:

      Fui  = unary(Fi)            discretize(10) then minmax, each over
                                  all of Fi (transformation-major)
      Foi  = higher-order(Fi+Fui) nansum/nanprod over combinations WITH
                                  replacement (commutative, repetition
                                  allowed); divide/subtract over ordered
                                  pairs (no repetition); GroupByThen
                                  {max,min,mean,std} over (value, key)
                                  ordered pairs — the three
                                  get_combinations branches of
                                  transformations/Transformation.py:72-83
      Foui = unary(Foi)

    Returns Fui + Foi + Foui in enumeration order (generate_candidates);
    include_raw=True appends Fi (generate_all_candidates:21-24).
    Applicability runs the engine's predicates
    (functions/expr.py:is_applicable), which mirror the reference's
    per-transformation is_applicable checks (numeric-only operands,
    no re-discretize/re-scale, div-by-zero guard, gbt value without
    missing values)."""
    from itertools import combinations_with_replacement, permutations

    def unary_over(feats: list[Feature]) -> list[Feature]:
        out = []
        for op in unary_ops:
            for p in feats:
                if is_applicable(op, (p,)):
                    out.append(unary(op, p))
        return out

    def higher_order_over(feats: list[Feature]) -> list[Feature]:
        out = []
        for op in commutative_ops:
            for a, b in combinations_with_replacement(feats, 2):
                if is_applicable(op, (a, b)):
                    out.append(binary(op, a, b))
        for op in ordered_ops:
            for a, b in permutations(feats, 2):
                if is_applicable(op, (a, b)):
                    out.append(binary(op, a, b))
        for agg in gbt_aggs:
            for v, k in permutations(feats, 2):
                if is_applicable(f"gbt_{agg}", (v, k)):
                    out.append(groupbythen(agg, v, k))
        return out

    fi = list(base_features)
    fui = unary_over(fi)
    foi = higher_order_over(fi + fui)
    foui = unary_over(foi)
    out = fui + foi + foui
    if include_raw:
        out.extend(fi)
    return out
