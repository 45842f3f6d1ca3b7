"""sklearn-style ConstructionTransformer — the reference's public API
(reference interactiveAutoML/feature_selection/
ConstructionTransformation.py:15-65) re-expressed over this engine.

fit(X, y): run the complexity-driven search on in-memory arrays; keep
every numeric, non-minus surviving representation (reference
ConstructionTransformation.py:45-56), fit their stateful nodes plus a
final min-max scaling of each output column on the train data.
transform(X): replay all kept representations, scaled, as a dense
float64 matrix (rows x features), columns in (complexity, name) order.

fit_dataset/transform_dataset: the scale path — same contract driven by
ray.data Datasets: search on a driver-side sample, distributed fit
(mergeable partials), backfill as map_batches.
"""

from __future__ import annotations

import numpy as np

from ..functions.expr import Feature
from ..functions.kernels import Fitted, evaluate, fit_on_arrays
from .search import ComplexityDrivenSearch, SearchResult


class ConstructionTransformer:
    def __init__(
        self,
        c_max: int | None = 2,
        epsilon: float = 0.0,
        cv: int = 5,
        seed: int = 42,
        max_feature_rep: int = 50,
        transformation_producer=None,
        use_ray: bool = True,
        lr_max_iter: int = 25,
        **search_kwargs,
    ):
        """transformation_producer(base_features) -> (unary_ops, binary_ops,
        gbt_aggs) — the reference's feature-space hook
        (reference candidate_generation/feature_space/division.py:23-56)."""
        self.c_max = c_max
        self.epsilon = epsilon
        self.cv = cv
        self.seed = seed
        self.max_feature_rep = max_feature_rep
        self.transformation_producer = transformation_producer
        self.use_ray = use_ray
        self.lr_max_iter = lr_max_iter
        self.search_kwargs = search_kwargs
        self.search_result_: SearchResult | None = None
        self.representations_: list[Feature] = []
        self.fitted_: Fitted = {}
        self.scale_: dict[str, tuple] = {}

    # -- in-memory path ------------------------------------------------------

    def _make_search(self, base_features) -> ComplexityDrivenSearch:
        kw = dict(self.search_kwargs)
        if self.transformation_producer is not None:
            unary_ops, binary_ops, gbt_aggs = self.transformation_producer(base_features)
            kw.update(unary_ops=unary_ops, binary_ops=binary_ops, gbt_aggs=gbt_aggs)
        return ComplexityDrivenSearch(
            c_max=self.c_max,
            epsilon=self.epsilon,
            cv=self.cv,
            seed=self.seed,
            use_ray=self.use_ray,
            lr_max_iter=self.lr_max_iter,
            **kw,
        )

    def fit(self, cols: dict[str, np.ndarray], y: np.ndarray, base_features: list[Feature]):
        res = self._make_search(base_features).run(cols, y, base_features)
        self.search_result_ = res
        # all numeric non-minus representations, complexity-ordered
        # (reference ConstructionTransformation.py:45-56)
        reps = [
            s.feature
            for layer in res.survivors.values()
            for s in layer
            if s.feature.op != "minus"
        ]
        reps = sorted(reps, key=lambda f: (f.complexity, f.name))[: self.max_feature_rep]
        self.representations_ = reps
        self.fitted_ = fit_on_arrays(reps, cols, y=y)
        # final per-column min-max scale fit on train outputs
        cache: dict = {}
        for f in reps:
            out = evaluate(f, cols, self.fitted_, cache)
            with np.errstate(all="ignore"):
                self.scale_[f.name] = (float(np.nanmin(out)), float(np.nanmax(out)))
        return self

    def transform(self, cols: dict[str, np.ndarray]) -> np.ndarray:
        assert self.representations_, "fit first"
        cache: dict = {}
        out = np.empty((len(next(iter(cols.values()))), len(self.representations_)))
        for j, f in enumerate(self.representations_):
            v = evaluate(f, cols, self.fitted_, cache)
            mn, mx = self.scale_[f.name]
            rng = mx - mn
            out[:, j] = (v - mn) / rng if rng > 0 else 0.0
        return out

    @property
    def feature_names_(self) -> list[str]:
        return [f.name for f in self.representations_]

    # -- Dataset path --------------------------------------------------------

    def fit_dataset(self, ds, *, sample_cols, y, base_features, input_cols=None):
        """Search on the in-memory sample, then distributed fit of the kept
        representations over the full Dataset (mergeable partials)."""
        from ..stages.fit import fit_distributed

        res = self._make_search(base_features).run(sample_cols, y, base_features)
        self.search_result_ = res
        reps = [
            s.feature
            for layer in res.survivors.values()
            for s in layer
            if s.feature.op != "minus"
        ]
        self.representations_ = sorted(
            reps, key=lambda f: (f.complexity, f.name)
        )[: self.max_feature_rep]
        self.fitted_ = fit_distributed(
            self.representations_,
            ds,
            input_cols=input_cols,
            sample_for_unmergeable=(sample_cols, y),
        )
        return self

    def transform_dataset(self, ds, **backfill_kwargs):
        from ..stages.backfill import backfill_dataset

        assert self.representations_, "fit first"
        return backfill_dataset(ds, self.representations_, self.fitted_, **backfill_kwargs)
