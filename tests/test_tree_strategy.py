"""TreeGenerator depth-layered strategy vs a hand-built oracle of the
reference's expansion semantics (candidate_generation/TreeGenerator.py:
62-143 + transformations/Transformation.py:72-83)."""

from itertools import combinations_with_replacement, permutations

import numpy as np

from complexity_driven_feature_construction_ray.functions.expr import (
    binary,
    groupbythen,
    raw,
    unary,
)
from complexity_driven_feature_construction_ray.pipelines.search import (
    TREE_OPS,
    ComplexityDrivenSearch,
    tree_expand,
)


def _fixture():
    x = raw("x", properties={"min": 1.0, "max": 9.0, "has_zero": False, "distinct": None})
    y2 = raw("y2", properties={"min": 2.0, "max": 8.0, "has_zero": False, "distinct": None})
    s = raw("s", "categorical", {"distinct": 3, "values": ["p", "q", "r"]})
    return x, y2, s


class TestTreeExpand:
    def test_one_step_matches_hand_built_reference_order(self):
        """Restricted op set whose applicability is fully pinned by the
        fixture properties; the expected list follows the reference's
        transformation-major order: unaries, then commutative, then
        ordered binaries, then GroupByThen."""
        x, y2, s = _fixture()
        fi = [x, y2, s]

        def numeric(f):
            return f.properties.get("type") == "numeric"

        expected = [unary("minmax", f) for f in fi if numeric(f)]
        expected += [
            binary("add", a, b)
            for a, b in combinations_with_replacement(fi, 2)
            if numeric(a) and numeric(b)
        ]
        expected += [
            binary("sub", a, b)
            for a, b in permutations(fi, 2)
            if numeric(a) and numeric(b)
        ]
        # with distinct=None on the numerics the only admissible
        # GroupByThen key is the categorical raw
        expected += [
            groupbythen("mean", v, k)
            for v, k in permutations(fi, 2)
            if numeric(v) and k is s
        ]

        got = tree_expand(
            fi,
            unary_ops=("minmax",),
            commutative_ops=("add",),
            ordered_ops=("sub",),
            gbt_aggs=("mean",),
        )
        assert [f.name for f in got] == [f.name for f in expected]

    def test_second_step_expands_over_accumulated_set(self):
        """Layer 2 pairs generated features with raws — TreeGenerator
        expands over chain(*F[0..d]), not just the newest layer."""
        x, y2, s = _fixture()
        mmx = unary("minmax", x)
        got = tree_expand(
            [x, y2, s, mmx],
            unary_ops=(),
            commutative_ops=("add",),
            ordered_ops=(),
            gbt_aggs=(),
        )
        names = {f.name for f in got}
        assert binary("add", x, mmx).name in names
        assert binary("add", y2, mmx).name in names


class TestTreeStrategySearch:
    def test_tree_search_scores_deeper_layers(self, ray_session):
        rng = np.random.default_rng(7)
        n = 400
        a = rng.uniform(1.0, 9.0, n)
        b = rng.uniform(2.0, 8.0, n)
        y = ((a / b) > np.median(a / b)).astype(np.int8)
        cols = {"a": a, "b": b}
        base = [
            raw("a", properties={"min": 1.0, "max": 9.0, "has_zero": False, "distinct": None}),
            raw("b", properties={"min": 2.0, "max": 8.0, "has_zero": False, "distinct": None}),
        ]
        res = ComplexityDrivenSearch(
            c_max=2, epsilon=-1e9, use_ray=True, lr_max_iter=15,
            strategy="tree", tree_depth=2, tree_frontier_cap=12, **TREE_OPS,
        ).run(cols, y, base)
        names = set(res.all_scored)
        # raws scored in layer 0
        assert {"a", "b"} <= names
        # depth-1 candidates present (binary names render as "(a/b)")
        assert any("/" in nm or "-" in nm for nm in names)
        # depth-2: a transform OF a generated feature (nested parens)
        assert any(nm.count("(") >= 2 for nm in names)
        # (a/b) (or its inverse) should be a strong candidate
        div_scores = [
            s.score for nm, s in res.all_scored.items()
            if nm in ("(a/b)", "(b/a)")
        ]
        assert div_scores and max(div_scores) > res.all_scored["a"].score

    def test_tree_search_deterministic(self, ray_session):
        rng = np.random.default_rng(3)
        n = 300
        a = rng.uniform(1.0, 9.0, n)
        y = (a > 5.0).astype(np.int8)
        cols = {"a": a}
        base = [raw("a", properties={"min": 1.0, "max": 9.0, "has_zero": False, "distinct": None})]

        def run():
            res = ComplexityDrivenSearch(
                c_max=2, epsilon=-1e9, use_ray=False, lr_max_iter=15,
                strategy="tree", tree_depth=2, **TREE_OPS,
            ).run(cols, y, base)
            return sorted((nm, round(s.score, 9)) for nm, s in res.all_scored.items())

        assert run() == run()
