from .expr import (
    Feature,
    raw,
    unary,
    binary,
    groupbythen,
    onehot,
    is_applicable,
    derive_properties,
    UNARY_OPS,
    BINARY_OPS,
    GBT_AGGS,
)
from .kernels import fit_on_arrays, evaluate, compile_many
from .sympy_rules import canonical_sympy, canonical_key, is_constant_expr

__all__ = [
    "Feature",
    "raw",
    "unary",
    "binary",
    "groupbythen",
    "onehot",
    "is_applicable",
    "derive_properties",
    "UNARY_OPS",
    "BINARY_OPS",
    "GBT_AGGS",
    "fit_on_arrays",
    "evaluate",
    "compile_many",
    "canonical_sympy",
    "canonical_key",
    "is_constant_expr",
]
