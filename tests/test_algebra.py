"""F2/F4/F5/F6 fixtures: feature algebra kernels + canonicalization."""

import numpy as np
import pytest

from complexity_driven_feature_construction_ray.functions import (
    binary,
    canonical_key,
    canonical_sympy,
    compile_many,
    evaluate,
    fit_on_arrays,
    groupbythen,
    is_applicable,
    is_constant_expr,
    raw,
    unary,
)
from complexity_driven_feature_construction_ray.functions.expr import identity, onehot
from complexity_driven_feature_construction_ray.functions.kernels import (
    _group_lookup,
    _group_reduce,
)


X = raw("x", properties={"min": 1.0, "max": 8.0, "has_zero": False, "distinct": 4})
B = raw("b", properties={"min": 4.0, "max": 7.0, "has_zero": False, "distinct": 4})
COLS = {"x": np.array([1.0, 2.0, 4.0, 8.0]), "b": np.array([4.0, 5.0, 6.0, 7.0])}


class TestGroupByThen:  # F2 — reference fastsklearnfeature/test/fastgroupby.py
    V = np.array([1, 2, 3, 4, 5, 6], dtype=float)
    K = np.array(["a", "b", "a", "b", "a", "b"])

    @pytest.mark.parametrize(
        "agg,expected",
        [
            ("max", [5, 6, 5, 6, 5, 6]),
            ("min", [1, 2, 1, 2, 1, 2]),
            ("mean", [3, 4, 3, 4, 3, 4]),
            ("count", [3, 3, 3, 3, 3, 3]),
            ("sum", [9, 12, 9, 12, 9, 12]),
            ("std", [1.632993161855452] * 6),
            ("median", [3, 4, 3, 4, 3, 4]),
        ],
    )
    def test_agg(self, agg, expected):
        fk, fv = _group_reduce(agg, self.V, self.K)
        assert np.allclose(_group_lookup(self.K, fk, fv), expected)

    def test_unseen_key_is_nan(self):
        fk, fv = _group_reduce("max", self.V, self.K)
        out = _group_lookup(np.array(["a", "zz"]), fk, fv)
        assert out[0] == 5 and np.isnan(out[1])

    def test_nan_values_skipped(self):
        v = np.array([1.0, np.nan, 3.0, 4.0])
        k = np.array(["a", "a", "a", "b"])
        fk, fv = _group_reduce("mean", v, k)
        assert np.allclose(fv, [2.0, 4.0])


class TestApplicability:  # F4 predicates (reference §2.4 static pruning)
    def test_gates(self):
        xz = raw("xz", properties={"min": 0.0, "max": 2.0, "has_zero": True})
        xm = raw("xm", properties={"missing_values": True, "min": 1.0, "max": 3.0})
        assert is_applicable("log", (X,)) and is_applicable("reciprocal", (X,))
        assert not is_applicable("log", (xz,))
        assert not is_applicable("reciprocal", (xz,))
        assert not is_applicable("div", (X, xz))
        assert is_applicable("impute_mean", (xm,))
        assert not is_applicable("impute_mean", (X,))  # no missing -> no impute
        assert not is_applicable("minmax", (unary("minmax", X),))  # no re-scale
        assert not is_applicable("log", (raw("s", "categorical"),))

    def test_complexity_accounting(self):
        f = binary("add", unary("log", X), B)
        assert X.complexity == 1 and f.complexity == 4
        assert identity((X, B)).complexity == 2  # identity adds 0


class TestKernels:  # F4/F5 values vs numpy oracle
    def test_unary_binary_values(self):
        feats = [
            unary("log", X), unary("minus", X), unary("reciprocal", X),
            unary("minmax", X), unary("zscore", X),
            binary("add", X, B), binary("mul", X, B),
            binary("sub", X, B), binary("div", X, B),
        ]
        fitted = fit_on_arrays(feats, COLS)
        out = compile_many(feats, fitted)(COLS)
        x, b = COLS["x"], COLS["b"]
        assert np.allclose(out["log(x)"], np.log(x))
        assert np.allclose(out["(-1*x)"], -x)
        assert np.allclose(out["(1/x)"], 1 / x)
        assert np.allclose(out["minmax(x)"], (x - 1) / 7)
        assert np.allclose(out["zscore(x)"], (x - x.mean()) / x.std())
        assert np.allclose(out["(b+x)"], x + b)
        assert np.allclose(out["(b*x)"], x * b)
        assert np.allclose(out["(x-b)"], x - b)
        assert np.allclose(out["(x/b)"], x / b)

    def test_train_fold_only_fit(self):
        # fit on train slice, apply to a different fold — state must come
        # from train only (reference fold semantics, SURVEY.md §7.4)
        f = unary("minmax", X)
        fitted = fit_on_arrays([f], {"x": np.array([0.0, 10.0])})
        out = evaluate(f, {"x": np.array([5.0, 20.0])}, fitted)
        assert np.allclose(out, [0.5, 2.0])  # extrapolates past train max

    def test_impute_and_nan_semantics(self):
        xm = raw("xm", properties={"missing_values": True})
        im = unary("impute_mean", xm)
        cm = {"xm": np.array([1.0, np.nan, 3.0])}
        fitted = fit_on_arrays([im], cm)
        assert np.allclose(evaluate(im, cm, fitted), [1.0, 2.0, 3.0])
        # nansum semantics: NaN treated as 0 when the other operand exists
        a = raw("a", properties={"missing_values": True})
        s = binary("add", a, B)
        out = evaluate(s, {"a": np.array([np.nan, 1.0]), "b": np.array([4.0, 4.0])}, {})
        assert np.allclose(out, [4.0, 5.0])

    def test_discretize(self):
        xd = raw("xd", properties={"min": 0.0, "max": 100.0, "distinct": 100})
        d = unary("discretize", xd)
        cd = {"xd": np.linspace(0, 100, 100)}
        fitted = fit_on_arrays([d], cd)
        vals = evaluate(d, cd, fitted)
        assert vals.min() == 0 and vals.max() == 9 and len(np.unique(vals)) == 10
        out = evaluate(d, {"xd": np.array([np.nan, 50.0])}, fitted)
        assert out[0] == -1.0 and out[1] == 4.0

    def test_onehot(self):
        s = raw("s", "categorical")
        f = onehot(s, "web")
        out = evaluate(f, {"s": np.array(["web", "chat", "web"])}, {})
        assert np.allclose(out, [1.0, 0.0, 1.0])

    def test_mdlp_finds_boundary(self):
        rng = np.random.default_rng(0)
        xx = np.concatenate([rng.normal(0, 1, 200), rng.normal(5, 1, 200)])
        yy = np.concatenate([np.zeros(200, int), np.ones(200, int)])
        m = raw("m", properties={"min": -5.0, "max": 10.0, "distinct": 400})
        f = unary("mdlp", m)
        fitted = fit_on_arrays([f], {"m": xx}, y=yy)
        cuts = fitted[f.name][0]
        assert len(cuts) >= 1 and 1.0 < cuts[0] < 4.0


class TestCanonicalization:  # F6 — reference sympy rewrite system
    S = raw("src", "categorical")
    N = raw("n", properties={"min": 1.0, "max": 9.0, "has_zero": False})

    def test_commutativity(self):
        assert canonical_key(binary("add", X, self.N)) == canonical_key(
            binary("add", self.N, X)
        )

    def test_gbt_idempotence(self):
        g = groupbythen("min", self.N, self.S)
        assert canonical_key(groupbythen("min", g, self.S)) == canonical_key(g)
        assert canonical_key(groupbythen("mean", g, self.S)) == canonical_key(g)

    def test_gbt_key_invariance(self):
        base = groupbythen("min", X, self.N)
        assert canonical_key(groupbythen("min", X, unary("minmax", self.N))) == canonical_key(base)
        assert canonical_key(groupbythen("min", X, unary("minus", self.N))) == canonical_key(base)

    def test_gbt_minus_flip(self):
        assert canonical_key(groupbythen("min", unary("minus", self.N), self.S)) == canonical_key(
            unary("minus", groupbythen("max", self.N, self.S))
        )

    def test_constant_pruning(self):
        assert is_constant_expr(canonical_sympy(binary("sub", X, X)))
        assert is_constant_expr(canonical_sympy(groupbythen("std", self.N, self.N)))
        assert not is_constant_expr(canonical_sympy(binary("add", X, self.N)))

    def test_scale_of_scale_and_set_flatten(self):
        assert canonical_key(unary("minmax", unary("minmax", X))) == canonical_key(
            unary("minmax", X)
        )
        assert identity((X, identity((B, X)))).name == "{b, x}"


class TestNewOps:
    """impute median/mode, numpy-ufunc, dummy-one (reference
    ImputationTransformation.py:35-50, NumericFunctionTransformation.py:1-8,
    DummyOneTransformation.py:11-12)."""

    M = raw("m", properties={"min": 1.0, "max": 9.0, "missing_values": True})
    COLS_M = {"m": np.array([1.0, np.nan, 3.0, 3.0, 9.0, np.nan, 1.0])}

    def test_impute_median(self):
        f = unary("impute_median", self.M)
        fitted = fit_on_arrays([f], self.COLS_M)
        out = evaluate(f, self.COLS_M, fitted)
        med = np.nanmedian(self.COLS_M["m"])
        assert np.allclose(out, [1.0, med, 3.0, 3.0, 9.0, med, 1.0])

    def test_impute_mode_tie_smallest(self):
        f = unary("impute_mode", self.M)
        fitted = fit_on_arrays([f], self.COLS_M)
        # 1.0 and 3.0 both appear twice -> smallest wins (sklearn most_frequent)
        assert fitted[f.name] == (1.0,)

    def test_impute_applicability(self):
        clean = raw("c", properties={"missing_values": False})
        assert not is_applicable("impute_median", (clean,))
        assert is_applicable("impute_mode", (self.M,))

    def test_npfun_and_dummy_one(self):
        from complexity_driven_feature_construction_ray.functions.expr import (
            dummy_one,
            npfunc,
        )

        f = npfunc("sqrt", X)
        out = evaluate(f, COLS, {})
        assert np.allclose(out, np.sqrt(COLS["x"]))
        one = dummy_one(X)
        assert np.allclose(evaluate(one, COLS, {}), 1.0)
        # constant-1 canonicalizes to a pruned constant
        assert is_constant_expr(canonical_sympy(one))
        # idempotence + key invariance extend to the new imputes
        g = unary("impute_median", unary("impute_median", self.M))
        assert canonical_key(g) == canonical_key(unary("impute_median", self.M))


def test_impute_mode_distributed_matches_in_memory(ray_session):
    import ray.data
    import pandas as pd
    from complexity_driven_feature_construction_ray.stages.fit import fit_distributed

    rng = np.random.default_rng(9)
    v = rng.integers(0, 5, 5000).astype(np.float64)
    v[rng.random(5000) < 0.2] = np.nan
    m = raw("m", properties={"min": 0.0, "max": 4.0, "missing_values": True})
    f = unary("impute_mode", m)
    local = fit_on_arrays([f], {"m": v})
    ds = ray.data.from_pandas(pd.DataFrame({"m": v})).repartition(8)
    dist = fit_distributed([f], ds, input_cols=["m"])
    assert local[f.name] == dist[f.name]
