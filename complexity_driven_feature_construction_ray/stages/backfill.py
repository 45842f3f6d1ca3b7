"""Full-table feature backfill — the core map_batches stage.

The reference backfills selected transformations over the full table in
15,000-row chunks with an mp.Pool per chunk, parallelizing over
*features* (reference new_project/fairexp.py:157-182). Here the whole
selected feature set is evaluated vectorized per Arrow batch and Ray
parallelizes over *batches* — the shape Ray Data is built for.

Stateful setup (deserializing plans, resolving the broadcast fitted
state from the object store) happens once per actor in __init__, not
once per batch. The fitted dict (scaler params, bin edges, per-key
group aggregates) is `ray.put` once by the driver and read by every
actor — never re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.expr import Feature
from ..functions.kernels import Fitted, compile_many


def _needed_raw(features: list[Feature]) -> list[str]:
    return sorted({f.params[0] for root in features for f in root.walk() if f.op == "raw"})


class FeatureBackfill:
    """Actor-pool callable: batch in -> batch + one float64 column per feature.

    `features`/`fitted` may be plain objects or ray.ObjectRef (broadcast)."""

    def __init__(self, features, fitted, keep_input: bool = True, custom_ops: dict | None = None):
        import ray

        if isinstance(features, ray.ObjectRef):
            features = ray.get(features)
        if isinstance(fitted, ray.ObjectRef):
            fitted = ray.get(fitted)
        if custom_ops:
            # user-registered ops are per-process; install the driver's
            # registry snapshot in this worker
            from ..functions.expr import CUSTOM_OPS

            CUSTOM_OPS.update(custom_ops)
        self.features: list[Feature] = features
        self.needed = _needed_raw(features)
        self.keep_input = keep_input
        self.run = compile_many(features, fitted)
        # output column name per feature, in complexity order then name
        # (reference fairexp.py:184-189 sorts backfilled columns by complexity)
        self.ordered = sorted(self.features, key=lambda f: (f.complexity, f.name))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .token_stats import numpy_base_columns

        cols = numpy_base_columns(batch, self.needed)
        out = self.run(cols)
        result = batch if self.keep_input else batch.select(
            [c for c in ("doc_id",) if c in batch.column_names]
        )
        for f in self.ordered:
            if f.name in result.column_names:
                continue  # raw feature already physical in the batch
            result = result.append_column(
                _safe_col_name(f.name), pa.array(out[f.name], type=pa.float64())
            )
        return result


def _safe_col_name(name: str) -> str:
    return name


# per-worker-process cache for the task path: compile once per worker,
# keyed by the broadcast refs (equivalent of actor __init__, without
# paying dedicated-actor-process startup)
_WORKER_CACHE: dict = {}


def _task_backfill(batch, *, features_ref, fitted_ref, keep_input, custom_ops=None):
    key = (features_ref.hex(), fitted_ref.hex(), keep_input)
    bf = _WORKER_CACHE.get(key)
    if bf is None:
        if len(_WORKER_CACHE) > 4:  # refs from prior runs are dead weight
            _WORKER_CACHE.clear()
        bf = _WORKER_CACHE[key] = FeatureBackfill(
            features_ref, fitted_ref, keep_input, custom_ops
        )
    return bf(batch)


def backfill_dataset(
    ds,
    features: list[Feature],
    fitted: Fitted,
    *,
    concurrency: int | None = None,
    batch_size: int | None = None,
    keep_input: bool = True,
    mode: str = "tasks",
):
    """Backfill as a map_batches stage over zero-copy Arrow batches.

    mode="tasks" (default): the feature plans + fitted state are tiny
    (scalar params and small per-key aggregate tables), so they are
    `ray.put` once and resolved through a per-worker compile cache —
    tasks reuse the already-warm Ray worker pool. Measured at 300k rows
    x 32 CPUs: 7.5s cold / 2.6s warm vs 36.4s / 4.7s for a dedicated
    actor pool (actor startup dominates).

    mode="actors": dedicated actor pool — the right shape when per-actor
    state is heavy (model weights, large indexes); `features`/`fitted`
    ship once per actor via constructor args.
    """
    import ray

    from ..functions.expr import CUSTOM_OPS

    if mode == "tasks":
        features_ref = ray.put(features)
        fitted_ref = ray.put(fitted)
        import functools

        fn = functools.partial(
            _task_backfill,
            features_ref=features_ref,
            fitted_ref=fitted_ref,
            keep_input=keep_input,
            custom_ops=dict(CUSTOM_OPS) or None,
        )
        # concurrency caps in-flight tasks here (it is not actor-pool
        # size); honored rather than silently ignored
        return ds.map_batches(
            fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    if concurrency is None:
        # leave headroom for the read/write stages so the pool doesn't
        # starve the rest of the pipeline
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(2, cpus - 2)
    return ds.map_batches(
        FeatureBackfill,
        fn_constructor_args=(features, fitted, keep_input, dict(CUSTOM_OPS) or None),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
