"""Algebraic canonicalization for candidate dedup (sympy, driver-side).

Re-creates the reference's rewrite system (FIXTURES.md F6):
- arithmetic canonicalization: a+b == b+a, factoring of nansum/nanprod
  chains (reference HigherOrderCommutativeTransformation.py:31)
- idempotence of scale/discretize/impute
  (reference MinMaxScalingTransformation.py:9-13,
  PandasDiscretizerTransformation.py:9-13, ImputationTransformation.py:9-13)
- GroupByThen rules (reference generators/GroupByThenGenerator.py:9-136):
  key invariance under injective key transforms (-1*, 1/x, scale, log,
  impute), conditional idempotence g(g(x|k)|k) = g(x|k), min(-x|k) =
  -max(x|k) and friends, std/var(x|x) = 0, g(x|x) = x
- concat set-flattening {A,{B,A}} == {A,B}
  (reference IdentityTransformation.py:8-31)

The candidate *plan* space is small — canonicalization is pure
driver-side Python; the data never sees sympy.
"""

from __future__ import annotations

import sympy

from .expr import Feature

_IDEMPOTENT_UNARY = {
    "minmax", "zscore", "impute_mean", "impute_median", "impute_mode", "discretize", "mdlp"
}
# injective value->value maps preserve the partition induced by a key
_KEY_INVARIANT = {
    "minus", "reciprocal", "log",
    "minmax", "zscore", "impute_mean", "impute_median", "impute_mode",
}

_GBT_FUNC: dict[str, sympy.Function] = {}


def _gbt(agg: str) -> sympy.Function:
    if agg not in _GBT_FUNC:
        _GBT_FUNC[agg] = sympy.Function(f"gbt_{agg}")
    return _GBT_FUNC[agg]


_UNARY_FUNC: dict[str, sympy.Function] = {}


def _ufunc(op: str) -> sympy.Function:
    if op not in _UNARY_FUNC:
        _UNARY_FUNC[op] = sympy.Function(op)
    return _UNARY_FUNC[op]


def _strip_key_transforms(f: Feature) -> Feature:
    """g(x | t(k)) == g(x | k) for injective t."""
    while f.op in _KEY_INVARIANT:
        f = f.parents[0]
    return f


def canonical_sympy(f: Feature) -> sympy.Expr:
    """Canonical algebraic form of a feature expression."""
    if f.op == "raw":
        return sympy.Symbol(f.params[0])
    if f.op == "minus":
        return -canonical_sympy(f.parents[0])
    if f.op == "reciprocal":
        return 1 / canonical_sympy(f.parents[0])
    if f.op == "log":
        return sympy.log(canonical_sympy(f.parents[0]))
    if f.op in _IDEMPOTENT_UNARY:
        p = f.parents[0]
        if p.op == f.op:  # f(f(x)) == f(x)
            return canonical_sympy(p)
        return _ufunc(f.op)(canonical_sympy(p))
    if f.op == "onehot":
        return _ufunc(f"onehot_{f.params[0]}")(canonical_sympy(f.parents[0]))
    if f.op == "npfun":
        return _ufunc(f"np_{f.params[0]}")(canonical_sympy(f.parents[0]))
    if f.op == "dummy_one":
        return sympy.Integer(1)  # constant: pruned by is_constant_expr
    if f.op == "add":
        return canonical_sympy(f.parents[0]) + canonical_sympy(f.parents[1])
    if f.op == "mul":
        return canonical_sympy(f.parents[0]) * canonical_sympy(f.parents[1])
    if f.op == "sub":
        return canonical_sympy(f.parents[0]) - canonical_sympy(f.parents[1])
    if f.op == "div":
        return canonical_sympy(f.parents[0]) / canonical_sympy(f.parents[1])
    if f.op.startswith("gbt_"):
        return _canonical_gbt(f)
    if f.op == "identity":
        return sympy.FiniteSet(*[canonical_sympy(p) for p in f.parents])
    from .expr import CUSTOM_OPS

    if f.op in CUSTOM_OPS:
        builder = CUSTOM_OPS[f.op]["sympy_builder"]
        children = [canonical_sympy(p) for p in f.parents]
        if builder:
            return builder(f, children)
        return _ufunc(f.op)(*children)
    raise ValueError(f.op)


def _canonical_gbt(f: Feature) -> sympy.Expr:
    agg = f.op[4:]
    value, key = f.parents
    key = _strip_key_transforms(key)
    key_s = canonical_sympy(key)
    value_s = canonical_sympy(value)

    # g(x | x) == x ; std/var(x | x) == 0
    if value_s == key_s:
        return sympy.Integer(0) if agg in ("std", "var") else value_s

    # min(-x|k) = -max(x|k) and friends
    if value.op == "minus":
        inner = value.parents[0]
        flip = {"min": "max", "max": "min"}
        if agg in flip:
            return -_gbt(flip[agg])(canonical_sympy(inner), key_s)
        if agg in ("mean", "sum", "median"):
            return -_gbt(agg)(canonical_sympy(inner), key_s)
        if agg in ("std", "var"):
            return _gbt(agg)(canonical_sympy(inner), key_s)

    # conditional idempotence: g'(g(x|k)|k) == g(x|k) for order-stat-like g'
    # (the inner value is constant within each key group)
    if value.op.startswith("gbt_"):
        inner_key = _strip_key_transforms(value.parents[1])
        if canonical_sympy(inner_key) == key_s:
            if agg in ("min", "max", "mean", "median"):
                return value_s
            if agg in ("std", "var"):
                return sympy.Integer(0)

    return _gbt(agg)(value_s, key_s)


def is_constant_expr(e: sympy.Expr) -> bool:
    """Constant candidates carry no signal and are pruned (reference
    ComplexityDrivenFeatureConstruction.py:148-155)."""
    return getattr(e, "is_number", False)


def canonical_key(f: Feature) -> str:
    """Stable dedup key (srepr is canonical for sympy's auto-sorted args)."""
    return sympy.srepr(canonical_sympy(f))
