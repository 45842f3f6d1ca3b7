"""Property-based invariants over random feature expressions.

- batch invariance: evaluating a feature over the whole table equals
  concatenating evaluations over any batch split (required for
  map_batches correctness at any block size).
- distributed fit == in-memory fit for mergeable state, any partition
  count (required for cluster-size-independent results).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from complexity_driven_feature_construction_ray.functions.expr import (
    Feature,
    binary,
    groupbythen,
    raw,
    unary,
)
from complexity_driven_feature_construction_ray.functions.kernels import (
    evaluate,
    fit_on_arrays,
)

N = 400
RNG = np.random.default_rng(77)
COLS = {
    "a": np.round(RNG.uniform(1.0, 9.0, N), 6),  # positive, no zero: every op applies
    "b": np.round(RNG.uniform(0.5, 4.0, N), 6),
    "k": RNG.choice(["p", "q", "r"], N),
}
A = raw("a", properties={"min": 1.0, "max": 9.0, "has_zero": False, "distinct": N})
B = raw("b", properties={"min": 0.5, "max": 4.0, "has_zero": False, "distinct": N})
K = raw("k", "categorical", {"distinct": 3})

UNARY = ("minus", "reciprocal", "log", "minmax", "zscore", "discretize")
BIN = ("add", "mul", "sub", "div")
GBT = ("max", "min", "mean", "std", "count", "sum")


@st.composite
def feature_trees(draw, depth=0):
    choice = draw(st.integers(0, 3 if depth < 2 else 0))
    if choice == 0:
        return draw(st.sampled_from([A, B]))
    if choice == 1:
        op = draw(st.sampled_from(UNARY))
        child = draw(feature_trees(depth=depth + 1))
        return unary(op, child)
    if choice == 2:
        op = draw(st.sampled_from(BIN))
        left = draw(feature_trees(depth=depth + 1))
        right = draw(feature_trees(depth=depth + 1))
        if op == "div" and right.properties.get("has_zero", True):
            right = B
        return binary(op, left, right)
    agg = draw(st.sampled_from(GBT))
    value = draw(feature_trees(depth=depth + 1))
    return groupbythen(agg, value, K)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(feature_trees(), st.integers(2, 7))
def test_batch_invariance(f: Feature, n_splits: int):
    """whole-table evaluation == concatenated per-batch evaluation."""
    fitted = fit_on_arrays([f], COLS)
    whole = evaluate(f, COLS, fitted)
    bounds = np.linspace(0, N, n_splits + 1).astype(int)
    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        sub = {c: v[lo:hi] for c, v in COLS.items()}
        parts.append(evaluate(f, sub, fitted))
    assert np.allclose(whole, np.concatenate(parts), equal_nan=True)


@pytest.mark.parametrize("num_blocks", [1, 3, 8])
def test_distributed_fit_partition_invariance(ray_session, num_blocks):
    """fit_distributed equals fit_on_arrays for every mergeable op, at any
    partition count."""
    import ray.data

    from complexity_driven_feature_construction_ray.stages.fit import fit_distributed

    feats = [
        unary("minmax", A),
        unary("zscore", B),
        unary("discretize", A),
        binary("add", A, B),
        *[groupbythen(agg, A, K) for agg in GBT],
    ]
    mem = fit_on_arrays(feats, COLS)
    ds = ray.data.from_pandas(pd.DataFrame(COLS)).repartition(num_blocks)
    dist = fit_distributed(feats, ds, input_cols=list(COLS))
    assert set(mem) == set(dist)
    for name in mem:
        for x, y_ in zip(mem[name], dist[name]):
            x, y_ = np.asarray(x), np.asarray(y_)
            if x.dtype.kind in "fciu":
                assert np.allclose(
                    x.astype(float), y_.astype(float), equal_nan=True
                ), name
            else:  # string key arrays (gbt)
                assert (x == y_).all(), name
