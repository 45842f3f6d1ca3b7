"""Data-mixing / domain-selection diagnostics: per-source KL
divergence, temperature sampling weights, keyword taxonomy tagging,
and DSIR importance weights — each against a brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from complexity_driven_feature_construction_ray.stages.text import (
    dsir_weights,
    keyword_tag_counts,
    source_token_divergence,
    temperature_mix_weights,
)


def _docs(texts, groups, ids=None):
    tbl = {
        "doc_id": np.arange(len(texts), dtype=np.int64) if ids is None else np.asarray(ids),
        "text": np.asarray(texts, dtype=object),
        "source": np.asarray(groups, dtype=object),
    }
    return ray.data.from_arrow(pa.table(tbl)).repartition(3)


class TestSourceTokenDivergence:
    def test_matches_bruteforce_kl(self, ray_session):
        rng = np.random.default_rng(7)
        vocab_a = ["alpha", "beta", "gamma", "delta"]
        vocab_b = ["delta", "eps", "zeta"]
        texts, groups = [], []
        for i in range(60):
            v = vocab_a if i % 2 == 0 else vocab_b
            texts.append(" ".join(rng.choice(v, size=rng.integers(3, 9))))
            groups.append("sA" if i % 2 == 0 else "sB")
        out = source_token_divergence(_docs(texts, groups))

        # brute force
        cells = {}
        for t, g in zip(texts, groups):
            for w in t.split():
                cells[(g, w)] = cells.get((g, w), 0) + 1
        total = sum(cells.values())
        for g in ("sA", "sB"):
            gn = sum(n for (gg, _), n in cells.items() if gg == g)
            kl = 0.0
            for (gg, w), n in cells.items():
                if gg != g:
                    continue
                p = n / gn
                q = sum(m for (_, ww), m in cells.items() if ww == w) / total
                kl += p * np.log(p / q)
            row = out[out["source"] == g].iloc[0]
            assert row["n_tok"] == gn
            assert abs(row["kl"] - kl) < 1e-8

    def test_identical_distribution_zero_kl(self, ray_session):
        texts = ["a b c"] * 40
        groups = ["s0" if i % 2 else "s1" for i in range(40)]
        out = source_token_divergence(_docs(texts, groups))
        assert np.allclose(out["kl"].to_numpy(), 0.0)


class TestTemperatureMix:
    def test_alpha_one_proportional_alpha_zero_uniform(self, ray_session):
        texts = ["w " * 10, "w " * 10, "w"] * 10  # s0: 200 tok, s1: 110 tok
        groups = (["s0", "s1", "s1"] * 10)
        ds = _docs(texts, groups)
        w1 = temperature_mix_weights(ds, alpha=1.0)
        n = w1.set_index("source")["n_tok"]
        assert n["s0"] == 100 and n["s1"] == 110
        exp = n / n.sum()
        assert np.allclose(w1.set_index("source")["weight"], exp.loc[w1["source"]], atol=1e-9)
        w0 = temperature_mix_weights(ds, alpha=0.0)
        assert np.allclose(w0["weight"].to_numpy(), 0.5)

    def test_sqrt_upsamples_small_source(self, ray_session):
        texts = ["tok " * 100] * 9 + ["tok"]
        groups = ["big"] * 9 + ["small"]
        w = temperature_mix_weights(_docs(texts, groups), alpha=0.5).set_index("source")
        frac_tokens = 1 / (900 + 1)
        assert w.loc["small", "weight"] > frac_tokens  # upsampled
        assert abs(w["weight"].sum() - 1.0) < 1e-9


class TestKeywordTag:
    def test_first_match_wins_and_counts(self, ray_session):
        taxonomy = [("x", ["foo", "bar"]), ("y", ["baz"])]
        texts = [
            "foo only",          # x
            "baz only",          # y
            "foo and baz",       # x (precedence)
            "barbed wire",       # x (substring match, like SQL LIKE)
            "nothing here",      # none
        ]
        groups = ["g"] * 5
        out = keyword_tag_counts(_docs(texts, groups), taxonomy)
        got = {(r["source"], r["topic"]): r["n"] for _, r in out.iterrows()}
        assert got == {("g", "x"): 3, ("g", "y"): 1, ("g", "none"): 1}

    def test_grouped_by_source(self, ray_session):
        taxonomy = [("t", ["kw"])]
        texts = ["kw", "kw", "no"] * 4
        groups = ["a", "b", "a"] * 4
        out = keyword_tag_counts(_docs(texts, groups), taxonomy)
        got = {(r["source"], r["topic"]): r["n"] for _, r in out.iterrows()}
        assert got == {("a", "t"): 4, ("a", "none"): 4, ("b", "t"): 4}


class TestDSIR:
    def test_target_like_docs_outrank(self, ray_session):
        rng = np.random.default_rng(11)
        tgt_vocab = ["law", "court", "judge", "statute"]
        raw_vocab = ["pixel", "render", "frame", "shader"]
        texts, langs = [], []
        # 20 target-domain docs (lang=en), 60 raw docs, 10 unlabeled
        # target-LIKE docs that DSIR should surface
        for _ in range(20):
            texts.append(" ".join(rng.choice(tgt_vocab, size=12)))
            langs.append("en")
        for _ in range(60):
            texts.append(" ".join(rng.choice(raw_vocab, size=12)))
            langs.append("xx")
        for _ in range(10):
            texts.append(" ".join(rng.choice(tgt_vocab, size=12)))
            langs.append("xx")
        ids = np.arange(len(texts), dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"doc_id": ids, "text": np.asarray(texts, dtype=object),
                      "lang": np.asarray(langs, dtype=object)})
        ).repartition(4)
        out = (
            dsir_weights(ds, target_col="lang", target_value="en", dim=512)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        target_like = out.loc[80:89, "logw"]
        raw_like = out.loc[20:79, "logw"]
        assert target_like.min() > raw_like.max()
        assert (out.loc[0:19, "logw"] > 0).all()

    def test_logw_matches_bruteforce(self, ray_session):
        texts = ["law court", "pixel render", "law pixel"]
        langs = ["en", "xx", "xx"]
        ids = np.arange(3, dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"doc_id": ids, "text": np.asarray(texts, dtype=object),
                      "lang": np.asarray(langs, dtype=object)})
        )
        dim, smoothing = 64, 0.5
        out = dsir_weights(ds, target_col="lang", target_value="en",
                           dim=dim, smoothing=smoothing).to_pandas().set_index("doc_id")

        from complexity_driven_feature_construction_ray.stages.dedup import _hash_words

        def bucket(w):
            # NB: uint64 % python-int promotes to float64 and garbles
            # the modulus — must mod by np.uint64 like the library does
            return int(_hash_words(np.array([w], dtype=object))[0] % np.uint64(dim))

        tgt = np.zeros(dim)
        raw = np.zeros(dim)
        for t, l in zip(texts, langs):
            for w in t.split():
                raw[bucket(w)] += 1
                if l == "en":
                    tgt[bucket(w)] += 1
        p_t = (tgt + smoothing) / (tgt.sum() + smoothing * dim)
        p_r = (raw + smoothing) / (raw.sum() + smoothing * dim)
        lam = np.log(p_t / p_r)
        for i, t in enumerate(texts):
            exp = sum(lam[bucket(w)] for w in t.split())
            assert abs(out.loc[i, "logw"] - exp) < 1e-8


class TestBigramPairCounts:
    def test_matches_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.token_stats import (
            bigram_pair_counts,
        )

        rng = np.random.default_rng(3)
        rows = [rng.integers(0, 50, size=rng.integers(0, 12)).astype(np.int32)
                for _ in range(300)]
        tbl = pa.table({"tokens": pa.array([r.tolist() for r in rows],
                                           type=pa.list_(pa.int32()))})
        ds = ray.data.from_arrow(tbl).repartition(5)
        got = bigram_pair_counts(ds, k=20).to_pandas()

        from collections import Counter
        c = Counter()
        for r in rows:
            for a, b in zip(r[:-1], r[1:]):
                c[(int(a), int(b))] += 1
        exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert len(got) == 20
        for (pair, n), (_, row) in zip(exp, got.iterrows()):
            assert (row["a"], row["b"], row["n"]) == (pair[0], pair[1], n)

    def test_empty_and_single_token_rows(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.token_stats import (
            bigram_pair_counts,
        )

        tbl = pa.table({"tokens": pa.array([[], [7], [1, 2], [2], []],
                                           type=pa.list_(pa.int32()))})
        got = bigram_pair_counts(ray.data.from_arrow(tbl), k=10).to_pandas()
        assert len(got) == 1
        assert (got.iloc[0]["a"], got.iloc[0]["b"], got.iloc[0]["n"]) == (1, 2, 1)


class TestDistinctSetOp:
    def _sides(self):
        l = pa.table({"k": np.array([1, 1, 2, 3, 5, 5], dtype=np.int64),
                      "s": np.asarray(list("aabbcc"), dtype=object)})
        r = pa.table({"k": np.array([2, 3, 3, 4], dtype=np.int64),
                      "s": np.asarray(["b", "b", "x", "d"], dtype=object)})
        return ray.data.from_arrow(l).repartition(3), ray.data.from_arrow(r).repartition(2)

    def test_intersect_and_except_multicol(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.partition import distinct_set_op

        l, r = self._sides()
        inter = distinct_set_op(l, r, on=["k", "s"], op="intersect", num_buckets=4).to_pandas()
        assert sorted(map(tuple, inter.to_numpy())) == [(2, "b"), (3, "b")]
        exc = distinct_set_op(l, r, on=["k", "s"], op="except", num_buckets=4).to_pandas()
        assert sorted(map(tuple, exc.to_numpy())) == [(1, "a"), (5, "c")]

    def test_distinct_semantics_single_col(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.partition import distinct_set_op

        l, r = self._sides()
        inter = distinct_set_op(l, r, on=["k"], op="intersect", num_buckets=4).to_pandas()
        assert sorted(inter["k"].tolist()) == [2, 3]  # no dup rows despite dup inputs
        exc = distinct_set_op(l, r, on=["k"], op="except", num_buckets=4).to_pandas()
        assert sorted(exc["k"].tolist()) == [1, 5]


class TestBoxCox:
    def test_distributed_fit_matches_inmemory_and_lognormal_lambda(self, ray_session):
        from complexity_driven_feature_construction_ray.functions.expr import box_cox, raw
        from complexity_driven_feature_construction_ray.functions.kernels import (
            evaluate,
            fit_on_arrays,
        )
        from complexity_driven_feature_construction_ray.stages.fit import fit_distributed

        rng = np.random.default_rng(5)
        x = np.exp(rng.normal(0.0, 1.0, size=4000))  # lognormal -> lambda ~ 0
        f = box_cox(raw("x", properties={"min": float(x.min()), "max": float(x.max())}))
        mem = fit_on_arrays([f], {"x": x})
        ds = ray.data.from_arrow(pa.table({"x": x})).repartition(6)
        dist = fit_distributed([f], ds, input_cols=["x"])
        assert mem[f.name] == dist[f.name]
        lam = dist[f.name][0]
        assert abs(lam) <= 0.2  # profile LL picks ~log for lognormal data
        y = evaluate(f, {"x": x}, dist)
        exp = np.log(x) if lam == 0 else (np.power(x, lam) - 1) / lam
        assert np.allclose(y, exp)

    def test_normal_positive_data_prefers_identityish_lambda(self, ray_session):
        from complexity_driven_feature_construction_ray.functions.expr import box_cox, raw
        from complexity_driven_feature_construction_ray.functions.kernels import fit_on_arrays

        rng = np.random.default_rng(9)
        x = rng.normal(100.0, 5.0, size=4000)  # already normal, far from 0
        f = box_cox(raw("x", properties={"min": float(x.min()), "max": float(x.max())}))
        lam = fit_on_arrays([f], {"x": x})[f.name][0]
        assert 0.4 <= lam <= 2.0

    def test_applicability_requires_positive(self):
        from complexity_driven_feature_construction_ray.functions.expr import (
            is_applicable,
            raw,
        )

        pos = raw("a", properties={"min": 0.5, "missing_values": False})
        nonpos = raw("b", properties={"min": -1.0, "missing_values": False})
        assert is_applicable("boxcox", (pos,))
        assert not is_applicable("boxcox", (nonpos,))


class TestYeoJohnson:
    def test_distributed_matches_inmemory_and_handles_negatives(self, ray_session):
        from complexity_driven_feature_construction_ray.functions.expr import raw, yeo_johnson
        from complexity_driven_feature_construction_ray.functions.kernels import (
            _yj_transform,
            evaluate,
            fit_on_arrays,
        )
        from complexity_driven_feature_construction_ray.stages.fit import fit_distributed

        rng = np.random.default_rng(13)
        # right-skewed data crossing zero -> lambda < 1
        x = rng.gamma(2.0, 2.0, size=4000) - 2.0
        f = yeo_johnson(raw("x", properties={"min": float(x.min()), "max": float(x.max())}))
        mem = fit_on_arrays([f], {"x": x})
        ds = ray.data.from_arrow(pa.table({"x": x})).repartition(6)
        dist = fit_distributed([f], ds, input_cols=["x"])
        assert mem[f.name] == dist[f.name]
        lam = dist[f.name][0]
        assert lam < 1.0
        y = evaluate(f, {"x": x}, dist)
        assert np.allclose(y, _yj_transform(x, lam))
        assert np.isfinite(y).all()

    def test_yj_transform_piecewise_continuity_and_nan(self):
        from complexity_driven_feature_construction_ray.functions.kernels import _yj_transform

        x = np.array([-3.0, -1e-9, 0.0, 1e-9, 3.0, np.nan])
        for lam in (-2.0, 0.0, 0.4, 2.0):
            y = _yj_transform(x, lam)
            assert abs(y[1] - y[3]) < 1e-8  # continuous through 0
            assert abs(y[2]) < 1e-12
            assert np.isnan(y[5])
            assert np.all(np.diff(y[:5]) > 0)  # strictly increasing


class TestPageRank:
    def test_matches_dense_power_iteration(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.graph import pagerank

        rng = np.random.default_rng(2)
        n = 60
        src = rng.integers(0, n, 300)
        dst = rng.integers(0, n, 300)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        edges = ray.data.from_pandas(
            pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
        ).repartition(4)
        out = pagerank(edges, n_iter=25, small_edge_budget=0).to_pandas().sort_values("id").reset_index(drop=True)

        ids = np.unique(np.concatenate([src, dst]))
        idx = {v: i for i, v in enumerate(ids)}
        N, d = len(ids), 0.85
        M = np.zeros((N, N))
        deg = np.zeros(N)
        for a in src:
            deg[idx[a]] += 1
        for a, b in zip(src, dst):
            M[idx[b], idx[a]] += 1.0 / deg[idx[a]]
        r = np.full(N, 1.0 / N)
        for _ in range(25):
            D = r[deg == 0].sum()
            r = (1 - d) / N + d * (M @ r + D / N)
        exp = pd.DataFrame({"id": ids, "rank": r}).sort_values("id").reset_index(drop=True)
        assert len(out) == len(exp)
        m = out.merge(exp, on="id", suffixes=("_got", "_exp"))
        assert np.allclose(m["rank_got"], m["rank_exp"], atol=1e-12)
        assert abs(out["rank"].sum() - 1.0) < 1e-9  # probability mass conserved

    def test_dangling_star_graph(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.graph import pagerank

        # hub 0 -> leaves 1..4, all leaves dangling
        edges = ray.data.from_pandas(
            pd.DataFrame({"src": np.zeros(4, np.int64), "dst": np.arange(1, 5, dtype=np.int64)})
        )
        out = pagerank(edges, n_iter=30, small_edge_budget=0).to_pandas().set_index("id")["rank"]
        assert abs(out.sum() - 1.0) < 1e-9
        # symmetry: the four leaves tie exactly; hub gets less than a leaf
        leaves = out.loc[[1, 2, 3, 4]].to_numpy()
        assert np.allclose(leaves, leaves[0])
        assert out.loc[0] < leaves[0]


class TestBPE:
    def test_merge_kernel_overlap_runs(self):
        from complexity_driven_feature_construction_ray.stages.bpe import merge_pair_flat

        # aaaa -> XX, aaa -> Xa, boundaries never crossed
        flat = np.array([7, 7, 7, 7, 7, 7, 7, 1, 7, 7, 2], dtype=np.int64)
        lengths = np.array([4, 3, 2, 2], dtype=np.int64)
        f2, l2 = merge_pair_flat(flat, lengths, 7, 7, 99)
        assert f2.tolist() == [99, 99, 99, 7, 1, 7, 7, 2]
        assert l2.tolist() == [2, 2, 2, 2]
        # empty-row edge: ends-1 == -1 must not unmask anything wrong
        f3, l3 = merge_pair_flat(
            np.array([3, 3], dtype=np.int64), np.array([0, 2], dtype=np.int64), 3, 3, 9
        )
        assert f3.tolist() == [9] and l3.tolist() == [0, 1]

    def test_train_matches_pure_python_reference(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.bpe import (
            apply_merges,
            bpe_reference,
            bpe_train,
        )

        rng = np.random.default_rng(7)
        rows = [rng.integers(0, 6, rng.integers(2, 30)).tolist() for _ in range(120)]
        ds = ray.data.from_arrow(
            pa.table({"doc": np.arange(len(rows)), "tokens": rows})
        ).repartition(5)
        got = bpe_train(ds, 8, checkpoint_every=3)
        exp = bpe_reference(rows, 8)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True)
        )
        # apply in one pass == iterated reference apply: compare total lengths
        applied = apply_merges(ds, got).to_pandas()
        seqs = [list(map(int, r)) for r in rows]
        for _, m in exp.iterrows():
            a, b, x = int(m["a"]), int(m["b"]), int(m["new_id"])
            out = []
            for r in seqs:
                s, i = [], 0
                while i < len(r):
                    if i + 1 < len(r) and r[i] == a and r[i + 1] == b:
                        s.append(x)
                        i += 2
                    else:
                        s.append(r[i])
                        i += 1
                out.append(s)
            seqs = out
        got_sorted = applied.sort_values("doc")["tokens"].tolist()
        assert [list(map(int, t)) for t in got_sorted] == seqs


class TestSkipgramPMI:
    def test_matches_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.token_stats import skipgram_pmi

        rng = np.random.default_rng(11)
        rows = [rng.integers(0, 5, rng.integers(1, 12)).tolist() for _ in range(200)]
        ds = ray.data.from_arrow(
            pa.table({"tokens": rows})
        ).repartition(4)
        got = skipgram_pmi(ds, window=2, mod=None, k=100)

        from collections import Counter
        c = Counter()
        for r in rows:
            for i in range(len(r)):
                for d in (1, 2):
                    if i + d < len(r):
                        c[(int(r[i]), int(r[i + d]))] += 1
        N = sum(c.values())
        ca = Counter(); cb = Counter()
        for (a, b), n in c.items():
            ca[a] += n; cb[b] += n
        exp = pd.DataFrame(
            [
                {"a": a, "b": b, "n": n,
                 "pmi": round(float(np.log(n * float(N) / (ca[a] * cb[b]))), 6)}
                for (a, b), n in c.items()
            ]
        ).sort_values(["n", "a", "b"], ascending=[False, True, True]).head(100).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n": np.int64}), exp.astype({"n": np.int64}), atol=2e-6, rtol=0
        )


class TestTokenEntropyZipf:
    def test_entropy_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.token_stats import (
            token_entropy_batch,
        )

        rows = [[1, 1, 1, 1], [1, 2, 3, 4], [5], [2, 2, 3]]
        batch = pa.table({"doc_id": ["a", "b", "c", "d"], "tokens": rows})
        out = token_entropy_batch(batch).to_pandas()
        exp = []
        for r in rows:
            _, c = np.unique(r, return_counts=True)
            p = c / len(r)
            exp.append(round(float(-(p * np.log(p)).sum()), 6))
        assert out["entropy"].tolist() == exp
        assert out["n_tok"].tolist() == [4, 4, 1, 3]

    def test_zipf_recovers_exponent(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.token_stats import zipf_fit

        # corpus with exact count(tok=r) = round(1000 / r): slope ~ -1
        toks = np.concatenate(
            [np.full(max(round(1000 / r), 1), r, dtype=np.int64) for r in range(1, 101)]
        )
        rng = np.random.default_rng(3)
        rng.shuffle(toks)
        rows = np.array_split(toks, 50)
        ds = ray.data.from_arrow(
            pa.table({"tokens": [r.tolist() for r in rows]})
        ).repartition(4)
        out = zipf_fit(ds, top_ranks=100)
        assert abs(out["slope"].iloc[0] + 1.0) < 0.05
        assert out["r2"].iloc[0] > 0.99
        assert out["n_ranks"].iloc[0] == 100
