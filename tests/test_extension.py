"""User-extension surface (SURVEY.md §2.7): ConstructionTransformer facade,
transformation-producer hook, custom-op registry."""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from complexity_driven_feature_construction_ray.functions.expr import (
    CUSTOM_OPS,
    custom,
    raw,
    register_op,
    unary,
)
from complexity_driven_feature_construction_ray.functions.kernels import (
    evaluate,
    fit_on_arrays,
)
from complexity_driven_feature_construction_ray.functions.sympy_rules import canonical_key
from complexity_driven_feature_construction_ray.pipelines.construct import (
    ConstructionTransformer,
)


@pytest.fixture()
def sample():
    from complexity_driven_feature_construction_ray.pipelines.flagship import search_sample

    cols, y = search_sample(800)
    base = [
        raw("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512}),
        raw("tok_mean", properties={"min": 0.0, "max": 50257.0, "has_zero": False}),
        raw("source", "categorical", {"distinct": 5, "values": ["books", "chat", "code", "web", "wiki"]}),
    ]
    return cols, y, base


def test_construction_transformer_fit_transform(ray_session, sample):
    cols, y, base = sample
    ct = ConstructionTransformer(c_max=2, epsilon=0.0, use_ray=False, lr_max_iter=10)
    ct.fit(cols, y, base)
    assert len(ct.representations_) > 3
    M = ct.transform(cols)
    assert M.shape == (len(y), len(ct.representations_))
    # min-max scaled outputs live in [0, 1] modulo NaN propagation
    finite = M[np.isfinite(M)]
    assert finite.min() >= -1e-9 and finite.max() <= 1.0 + 1e-9
    # transform is deterministic
    assert np.allclose(M, ct.transform(cols), equal_nan=True)


def test_transformation_producer_hook(ray_session, sample):
    cols, y, base = sample

    def producer(base_features):
        return ("log", "minmax"), ("add",), ("mean",)

    ct = ConstructionTransformer(
        c_max=2, use_ray=False, lr_max_iter=10, transformation_producer=producer
    )
    ct.fit(cols, y, base)
    ops = {f.op for f in ct.representations_}
    assert ops <= {"raw", "log", "minmax", "add", "gbt_mean", "onehot"}


def test_dataset_fit_transform_matches_in_memory(ray_session, sample):
    from complexity_driven_feature_construction_ray.sources.token_table import (
        token_table_dataset,
        TOKEN_TABLE_SCHEMA,
    )
    from complexity_driven_feature_construction_ray.stages.token_stats import (
        TOKEN_STAT_COLS,
        token_stats_dataset,
    )

    cols, y, base = sample
    ds = token_stats_dataset(token_table_dataset(800))
    ct = ConstructionTransformer(c_max=2, use_ray=False, lr_max_iter=10)
    ct.fit_dataset(
        ds, sample_cols=cols, y=y, base_features=base,
        input_cols=[*TOKEN_TABLE_SCHEMA.names, *TOKEN_STAT_COLS],
    )
    out = ct.transform_dataset(ds).to_pandas()
    # distributed backfill values match in-memory evaluation (allclose)
    mem_fitted = fit_on_arrays(ct.representations_, cols, y=y)
    for f in ct.representations_:
        if f.name in ("n_tok", "source"):
            continue
        mem = evaluate(f, cols, mem_fitted)
        got = out.sort_values("doc_id")[f.name].to_numpy()
        assert np.allclose(got, mem, equal_nan=True, rtol=1e-9), f.name


def test_custom_op_registry(ray_session):
    register_op(
        "clip95",
        kernel=lambda args, f, state: np.clip(args[0], None, state[0]),
        fit=lambda parents, y: (float(np.nanquantile(parents[0], 0.95)),),
        properties=lambda f: {"min": f.parents[0].properties.get("min"), "max": None},
    )
    try:
        x = raw("x", properties={"min": 0.0, "max": 100.0})
        f = custom("clip95", x)
        assert f.name == "clip95(x)"
        cols = {"x": np.arange(100, dtype=np.float64)}
        fitted = fit_on_arrays([f], cols)
        out = evaluate(f, cols, fitted)
        assert out.max() == pytest.approx(np.quantile(cols["x"], 0.95))
        # participates in canonicalization and the distributed fit path
        assert canonical_key(f) != canonical_key(x)
        from complexity_driven_feature_construction_ray.stages.fit import fit_distributed

        ds = ray.data.from_pandas(pd.DataFrame({"x": cols["x"]})).repartition(4)
        dist = fit_distributed([f], ds, input_cols=["x"], sample_for_unmergeable=(cols, None))
        assert dist[f.name] == fitted[f.name]
    finally:
        CUSTOM_OPS.pop("clip95", None)


def test_custom_op_through_distributed_backfill(ray_session):
    """Registered ops work inside Ray workers (the per-process registry
    ships with the backfill state)."""
    register_op(
        "half",
        kernel=lambda args, f, state: args[0] * 0.5,
    )
    try:
        import pandas as pd
        import numpy as np
        import ray.data
        from complexity_driven_feature_construction_ray.stages.backfill import (
            backfill_dataset,
        )

        x = raw("x", properties={"min": 0.0, "max": 100.0})
        f = custom("half", x)
        df = pd.DataFrame({"x": np.arange(100, dtype=np.float64)})
        ds = ray.data.from_pandas(df).repartition(4)
        out = backfill_dataset(ds, [f], {}).to_pandas().sort_values("x")
        assert np.allclose(out["half(x)"], df["x"] * 0.5)
    finally:
        CUSTOM_OPS.pop("half", None)
