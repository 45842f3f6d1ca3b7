"""Round-3 curation ops: mixture sampling, deterministic shuffle,
duplicated-passage stats, and the hashed-BoW quality classifier —
each against a brute-force pure-Python oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from complexity_driven_feature_construction_ray.stages.dedup import dup_passages
from complexity_driven_feature_construction_ray.stages.qualityclf import (
    QualityClassifierScorer,
    hashed_bow,
    score_quality,
    train_quality_classifier,
)
from complexity_driven_feature_construction_ray.stages.sampling import (
    det_hash_u32,
    deterministic_shuffle_key,
    mixture_sample,
)


def _docs_ds(rows: dict) -> "ray.data.Dataset":
    return ray.data.from_arrow(pa.table(rows))


class TestMixtureSample:
    def test_matches_bruteforce_predicate(self, ray_session):
        n = 2000
        ids = np.arange(n, dtype=np.int64)
        src = np.array([f"s{i % 3}" for i in ids], dtype=object)
        rates = {"s0": 1.0, "s1": 0.4, "s2": 0.0}
        ds = _docs_ds({"doc_id": ids, "source": src})
        got = set(
            mixture_sample(ds, rates, seed=17).to_pandas()["doc_id"].tolist()
        )
        h = det_hash_u32(ids, 17) % np.uint64(10_000)
        thr = np.array([int(rates[s] * 10_000) for s in src])
        expected = set(ids[h.astype(np.int64) < thr].tolist())
        assert got == expected
        # rate-0 source fully dropped, rate-1 source fully kept
        assert all(src[i] != "s2" for i in got)
        assert {int(i) for i in ids[src == "s0"]} <= got

    def test_unknown_source_dropped_and_deterministic(self, ray_session):
        ids = np.arange(500, dtype=np.int64)
        src = np.where(ids % 2 == 0, "known", "mystery").astype(object)
        ds = _docs_ds({"doc_id": ids, "source": src})
        a = mixture_sample(ds, {"known": 0.5}, seed=3).to_pandas()
        b = mixture_sample(ds, {"known": 0.5}, seed=3).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        assert set(a["source"]) == {"known"}

    def test_approximates_requested_rate(self, ray_session):
        ids = np.arange(20_000, dtype=np.int64)
        ds = _docs_ds({"doc_id": ids, "source": np.full(len(ids), "w", dtype=object)})
        kept = mixture_sample(ds, {"w": 0.25}, seed=11).count()
        assert abs(kept / len(ids) - 0.25) < 0.02


class TestDeterministicShuffle:
    def test_key_is_hash_of_id_and_sort_is_stable_across_runs(self, ray_session):
        ids = np.arange(1000, dtype=np.int64)
        ds = _docs_ds({"doc_id": ids})
        out = (
            deterministic_shuffle_key(ds, seed=29, out_col="k")
            .sort("k")
            .to_pandas()
        )
        assert (out["k"].to_numpy() == det_hash_u32(ids, 29).astype(np.int64)[out["doc_id"]]).all()
        assert (np.diff(out["k"].to_numpy()) >= 0).all()
        # different seed -> different order; same seed -> same order
        out2 = (
            deterministic_shuffle_key(ds, seed=29, out_col="k").sort("k").to_pandas()
        )
        assert out["doc_id"].tolist() == out2["doc_id"].tolist()
        out3 = (
            deterministic_shuffle_key(ds, seed=30, out_col="k").sort("k").to_pandas()
        )
        assert out["doc_id"].tolist() != out3["doc_id"].tolist()


def _brute_dup_passages(texts: list[str], k: int) -> pd.DataFrame:
    from collections import Counter

    grams = []
    for i, t in enumerate(texts):
        ws = t.split()
        grams.append([" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)])
    corpus = Counter(g for doc in grams for g in doc)
    rows = []
    for i, doc in enumerate(grams):
        if not doc:
            continue
        dup = sum(1 for g in doc if corpus[g] >= 2)
        rows.append((i, len(doc), round(dup / len(doc), 6)))
    return pd.DataFrame(rows, columns=["doc_id", "n_shingles", "dup_frac"])


class TestDupPassages:
    def test_matches_bruteforce_on_planted_duplicates(self, ray_session):
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(50)]
        passage = "alpha beta gamma delta epsilon zeta eta"
        texts = []
        for i in range(40):
            words = list(rng.choice(vocab, size=30))
            t = " ".join(words)
            if i % 4 == 0:  # plant a shared passage in a quarter of docs
                t = t + " " + passage
            texts.append(t)
        texts.append("too short")  # < k words -> no row
        ds = _docs_ds(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": np.array(texts, dtype=object)}
        )
        got = (
            dup_passages(ds, shingle_words=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = _brute_dup_passages(texts, 5)
        pd.testing.assert_frame_equal(
            got, exp, check_dtype=False, check_exact=False, atol=1e-6
        )
        # planted docs must show duplicated shingles
        planted = got[got["doc_id"] % 4 == 0]
        assert (planted["dup_frac"] > 0).all()

    def test_within_document_repeat_counts_as_duplicate(self, ray_session):
        texts = ["a b c d e f a b c d e f", "x y z q r s t"]
        ds = _docs_ds({"doc_id": np.array([0, 1]), "text": np.array(texts, dtype=object)})
        got = dup_passages(ds, shingle_words=5).to_pandas().set_index("doc_id")
        exp = _brute_dup_passages(texts, 5).set_index("doc_id")
        assert got.loc[0, "dup_frac"] == exp.loc[0, "dup_frac"] > 0
        assert got.loc[1, "dup_frac"] == 0.0


class TestQualityClassifier:
    def test_separates_planted_quality_classes(self, ray_session):
        rng = np.random.default_rng(9)
        hi_vocab = ["theorem", "analysis", "citation", "paragraph", "reference"]
        lo_vocab = ["click", "buy", "free", "winner", "casino"]
        texts, labels = [], []
        for i in range(300):
            hi = i % 2 == 0
            vocab = hi_vocab if hi else lo_vocab
            texts.append(" ".join(rng.choice(vocab, size=20)))
            labels.append(1.0 if hi else 0.0)
        w = train_quality_classifier(texts, np.array(labels), n_features=256)
        ds = _docs_ds(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": np.array(texts, dtype=object)}
        )
        out = score_quality(ds, w, concurrency=2).to_pandas().sort_values("doc_id")
        p = out["quality_prob"].to_numpy()
        y = np.array(labels)
        assert p[y == 1].min() > 0.9
        assert p[y == 0].max() < 0.1

    def test_scorer_matches_driver_side_model(self, ray_session):
        texts = ["one two three four", "five six seven", "one one one"]
        labels = np.array([1.0, 0.0, 1.0])
        w = train_quality_classifier(texts, labels, n_features=64)
        M = hashed_bow(texts, 64)
        z = np.clip(M @ w[:-1] + w[-1], -35, 35).astype(np.float64)
        expected = np.round(1.0 / (1.0 + np.exp(-z)), 6)
        scorer = QualityClassifierScorer(w)
        got = scorer(
            pa.table({"doc_id": np.arange(3), "text": np.array(texts, dtype=object)})
        )["quality_prob"].to_numpy()
        np.testing.assert_allclose(got, expected, atol=1e-9)

    def test_training_is_deterministic(self):
        texts = [f"word{i % 7} filler text here" for i in range(100)]
        labels = (np.arange(100) % 2).astype(np.float64)
        w1 = train_quality_classifier(texts, labels, n_features=128)
        w2 = train_quality_classifier(texts, labels, n_features=128)
        np.testing.assert_array_equal(w1, w2)


class TestBM25:
    def test_matches_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.text import bm25_topk

        rng = np.random.default_rng(5)
        vocab = ["alpha", "beta", "gamma", "delta", "eps"]
        docs = [
            " ".join(rng.choice(vocab, rng.integers(3, 40)).tolist()) for _ in range(150)
        ]
        ids = [f"d{i:03d}" for i in range(150)]
        ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": docs})).repartition(4)
        terms = ["alpha", "gamma"]
        got = bm25_topk(ds, terms, k=10).to_pandas()

        # brute force
        k1, b = 1.2, 0.75
        split = [d.split() for d in docs]
        N = len(docs)
        avgdl = sum(len(s) for s in split) / N
        dfv = {t: sum(t in s for s in split) for t in terms}
        rows = []
        for i, s in enumerate(split):
            sc = 0.0
            for t in terms:
                tf = s.count(t)
                idf = np.log(1 + (N - dfv[t] + 0.5) / (dfv[t] + 0.5))
                sc += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(s) / avgdl))
            rows.append((ids[i], round(sc, 6)))
        exp = pd.DataFrame(rows, columns=["doc_id", "bm25"]).sort_values(
            ["bm25", "doc_id"], ascending=[False, True]
        ).head(10).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


class TestPIIScrub:
    def test_counts_and_redaction(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.text import pii_scrub_summary

        df = pd.DataFrame(
            {
                "text": [
                    "mail me at a.b@host.com and bob@x.org now",
                    "call 555-0123 or 555-9999 from 10.0.0.1",
                    "clean document, nothing here",
                    "",
                ],
                "source": ["s1", "s1", "s2", "s2"],
            }
        )
        ds = ray.data.from_pandas(df).repartition(2)
        out = pii_scrub_summary(ds).to_pandas().set_index("source")
        assert out.loc["s1", "email_hits"] == 2
        assert out.loc["s1", "phone_hits"] == 2
        assert out.loc["s1", "ip_hits"] == 1
        assert out.loc["s1", "docs_flagged"] == 2
        assert out.loc["s2", "email_hits"] == 0
        assert out.loc["s2", "docs_flagged"] == 0
        assert out.loc["s2", "chars_removed"] == 0
        # chars_removed: len(orig) - len(scrubbed) with [EMAIL]/[PHONE]/[IP]
        import re
        row0 = df["text"][0]
        scr = re.sub(r"[A-Za-z0-9.]+@[A-Za-z0-9]+\.[A-Za-z]+", "[EMAIL]", row0)
        row1 = df["text"][1]
        scr1 = re.sub(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", "[IP]", row1)
        scr1 = re.sub(r"[0-9]{3}-[0-9]{4}", "[PHONE]", scr1)
        exp_removed = (len(row0) - len(scr)) + (len(row1) - len(scr1))
        assert out.loc["s1", "chars_removed"] == exp_removed


class TestNormDedup:
    def test_matches_bruteforce_on_sf0001(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import d_norm_dedup

        sf = "/root/testdata/sf0.001"
        got = d_norm_dedup(sf).to_pandas().reset_index(drop=True)

        raw = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        ids = raw["doc_id"].to_numpy()
        txt = raw["text"].fillna("").copy()
        variant = np.where(
            (ids // 50) % 2 == 0,
            "The QUICK, brown fox #" + pd.Series(ids % 3).astype(str),
            "  the quick brown fox!! #" + pd.Series(ids % 3).astype(str) + " ",
        )
        txt = txt.where(pd.Series(ids % 50 != 1, index=txt.index), variant)
        norm = (
            txt.str.lower()
            .str.replace(r"[^a-z0-9\s]", "", regex=True)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        exp = (
            pd.DataFrame({"doc_id": ids, "norm": norm})
            .groupby("norm", sort=False)
            .agg(doc_id=("doc_id", "min"), group_size=("doc_id", "size"))
            .reset_index(drop=True)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["doc_id", "group_size"]], exp)
        # the injected slice must actually produce cross-doc duplicate groups
        assert (got["group_size"] > 1).any()


class TestFuzzyMatch:
    def test_matches_bruteforce_dp_and_tiebreak(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.text import fuzzy_match

        def ref(a, b):
            la, lb = len(a), len(b)
            D = [[0] * (lb + 1) for _ in range(la + 1)]
            for i in range(la + 1):
                D[i][0] = i
            for j in range(lb + 1):
                D[0][j] = j
            for i in range(1, la + 1):
                for j in range(1, lb + 1):
                    D[i][j] = min(
                        D[i - 1][j] + 1,
                        D[i][j - 1] + 1,
                        D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                    )
            return D[la][lb]

        rng = np.random.default_rng(11)
        alpha = list("abx ")
        strs = ["".join(rng.choice(alpha, size=rng.integers(0, 20))) for _ in range(60)]
        strs += ["", "abba", "zzzz"]
        cands = ["abba", "abab", "xx", "b"]
        ds = _docs_ds({"doc_id": np.arange(len(strs), dtype=np.int64), "q": np.array(strs, dtype=object)})
        got = fuzzy_match(ds, cands, col="q").to_pandas().sort_values("doc_id").reset_index(drop=True)
        for i, s in enumerate(strs):
            dists = {c: ref(s, c) for c in cands}
            best = min(sorted(cands), key=lambda c: dists[c])
            assert got.loc[i, "best_match"] == best, (s, dists, got.loc[i])
            assert got.loc[i, "dist"] == dists[best]


class TestDedupAgainst:
    def test_drops_only_cross_shard_exact_matches(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.dedup import dedup_against

        old = _docs_ds(
            {
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
                "text": np.array(["alpha", "beta", "gamma"], dtype=object),
            }
        )
        new = _docs_ds(
            {
                "doc_id": np.array([10, 11, 12, 13], dtype=np.int64),
                "text": np.array(["beta", "delta", "alpha", "Alpha"], dtype=object),
            }
        )
        kept = (
            dedup_against(new.repartition(3), old.repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # beta/alpha dropped (exact matches); delta and case-different Alpha kept
        assert kept["doc_id"].tolist() == [11, 13]
        assert kept["text"].tolist() == ["delta", "Alpha"]


class TestWeightedSample:
    def test_matches_bruteforce_ares(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.sampling import (
            det_hash_u32,
            weighted_sample,
        )

        n, k = 5000, 50
        ids = np.arange(n, dtype=np.int64)
        rng = np.random.default_rng(3)
        w = rng.integers(1, 500, size=n).astype(np.int64)
        w[::97] = 0  # non-positive weights must be excluded
        ds = _docs_ds({"doc_id": ids, "w": w}).repartition(7)
        got = (
            weighted_sample(ds, k, weight_col="w")
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        u = (det_hash_u32(ids, 23).astype(np.float64) + 0.5) / float(1 << 32)
        key = np.where(w > 0, np.log(u) / np.where(w > 0, w, 1), -np.inf)
        exp = sorted(ids[np.argsort(key)[::-1][:k]].tolist())
        assert got == exp
        assert not any(w[d] == 0 for d in got)

    def test_heavy_row_always_selected(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.sampling import weighted_sample

        ids = np.arange(2000, dtype=np.int64)
        w = np.ones(2000, dtype=np.int64)
        w[1234] = 10_000_000  # ~always beats unit-weight rows for k=20
        ds = _docs_ds({"doc_id": ids, "w": w})
        got = set(weighted_sample(ds, 20, weight_col="w").to_pandas()["doc_id"])
        assert 1234 in got


class TestSourceContamination:
    def test_matches_bruteforce_jaccard(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.dedup import source_contamination

        docs = {
            "a": ["one two three four five six", "alpha beta gamma delta eps zeta"],
            "b": ["one two three four five seven", "unrelated words here entirely now ok"],
            "c": ["alpha beta gamma delta eps zeta"],
        }
        rows_src, rows_txt = [], []
        for s, ts in docs.items():
            for t in ts:
                rows_src.append(s)
                rows_txt.append(t)
        ds = _docs_ds(
            {"source": np.array(rows_src, dtype=object), "text": np.array(rows_txt, dtype=object)}
        ).repartition(3)
        got = source_contamination(ds, shingle_words=5)

        def grams(t):
            ws = t.split()
            return {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}

        sets = {s: set().union(*(grams(t) for t in ts)) for s, ts in docs.items()}
        exp = []
        for a in sorted(sets):
            for b in sorted(sets):
                if a < b and sets[a] & sets[b]:
                    sh = len(sets[a] & sets[b])
                    exp.append(
                        (a, b, sh, round(sh / len(sets[a] | sets[b]), 6))
                    )
        exp_df = pd.DataFrame(
            exp, columns=["source_a", "source_b", "shared_ngrams", "jaccard"]
        )
        pd.testing.assert_frame_equal(got, exp_df)


class TestPSIDrift:
    def test_matches_bruteforce_and_detects_shift(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.stats import psi_drift

        rng = np.random.default_rng(9)
        ref_x = rng.integers(100, 1100, size=3000).astype(np.int64)
        cur_same = rng.integers(100, 1100, size=1000).astype(np.int64)
        cur_shift = rng.integers(900, 2500, size=1000).astype(np.int64)

        def brute(ref, cur, bins=10, floor=1e-6):
            lo, hi = float(ref.min()), float(ref.max())
            span = hi - lo if hi > lo else 1.0
            def h(x):
                idx = np.clip(np.floor((x - lo) * bins / span).astype(int), 0, bins - 1)
                return np.bincount(idx, minlength=bins)
            p = np.maximum(h(ref) / len(ref), floor)
            q = np.maximum(h(cur) / len(cur), floor)
            return round(float(np.sum((q - p) * np.log(q / p))), 6)

        for cur in (cur_same, cur_shift):
            ref_ds = _docs_ds({"v": ref_x}).repartition(4)
            cur_ds = _docs_ds({"v": cur}).repartition(3)
            got = psi_drift(ref_ds, cur_ds, col="v")
            assert got.loc[0, "psi"] == brute(ref_x, cur)
            assert got.loc[0, "n_ref"] == 3000 and got.loc[0, "n_cur"] == 1000
        same_psi = brute(ref_x, cur_same)
        shift_psi = brute(ref_x, cur_shift)
        assert same_psi < 0.1 < shift_psi  # stable vs shifted corpus


class TestMinhashIncremental:
    def test_flags_planted_cross_shard_neardups_only(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.dedup import (
            minhash_dedup_incremental,
        )

        base = (
            "the quick brown fox jumps over the lazy dog while seventeen "
            "green bottles hang on the wall and slowly fall down one by one "
            "in the warm afternoon sun near the old stone bridge"
        )
        rng = np.random.default_rng(2)
        def noise(i):
            return " ".join(
                f"w{rng.integers(0, 10_000)}" for _ in range(40)
            ) + f" tail{i}"

        old_txt = [base, noise(1), noise(2), base + " extra ending words"]
        old_ids = [1, 2, 3, 4]
        new_txt = [
            base + " tiny change",          # near-dup of old 1
            base,                            # exact dup of old 1
            noise(10),                       # unrelated
            new_only := base.replace("fox", "cat") + " distinct tail",  # near-dup too
        ]
        new_ids = [101, 102, 103, 104]
        old = _docs_ds({"doc_id": np.array(old_ids, dtype=np.int64), "text": np.array(old_txt, dtype=object)}).repartition(2)
        new = _docs_ds({"doc_id": np.array(new_ids, dtype=np.int64), "text": np.array(new_txt, dtype=object)}).repartition(2)
        got = minhash_dedup_incremental(new, old, threshold=0.5)
        flagged = dict(zip(got["doc_id"], got["matched_id"]))
        assert 101 in flagged and 102 in flagged
        assert flagged[102] == 1  # exact dup matches min-id historical doc
        assert got.loc[got["doc_id"] == 102, "est"].iloc[0] == 1.0
        assert 103 not in flagged  # unrelated new doc untouched
        # within-new near-dups are NOT this operator's job: only
        # new-vs-old hits appear, and every match id is historical
        assert set(got["matched_id"]).issubset(set(old_ids))


class TestGroupedTopTokens:
    def test_matches_bruteforce_counts_and_ties(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.text import grouped_top_tokens

        docs = {
            "a": ["x x x y y z", "y z z"],
            "b": ["q q r r", "r s"],
        }
        src, txt = [], []
        for s, ts in docs.items():
            for t in ts:
                src.append(s)
                txt.append(t)
        ds = _docs_ds(
            {"source": np.array(src, dtype=object), "text": np.array(txt, dtype=object)}
        ).repartition(3)
        got = (
            grouped_top_tokens(ds, k=2)
            .to_pandas()
            .sort_values(["source", "c", "token"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        # a: x=3, y=3 (tie -> token order), z=3... z also 3! counts: x3 y3 z3 -> top2 = x, y
        # b: r=3, q=2
        exp = pd.DataFrame(
            {"source": ["a", "a", "b", "b"], "token": ["x", "y", "r", "q"],
             "c": np.array([3, 3, 3, 2], dtype=np.int64)}
        )
        pd.testing.assert_frame_equal(got[["source", "token", "c"]], exp)


class TestSequenceDedup:
    def test_groups_by_exact_token_array(self, ray_session):
        import pyarrow as pa

        from complexity_driven_feature_construction_ray.stages.dedup import sequence_dedup

        seqs = [
            [1, 2, 3],
            [1, 2, 3],          # dup of row 0
            [1, 2],             # prefix is NOT a dup
            [3, 2, 1],          # permutation is NOT a dup
            [],
            [],                 # empty sequences group together
            [1, 2, 3],          # third member of group 0
        ]
        ids = [f"doc-{i:012d}" for i in range(len(seqs))]
        tbl = pa.table(
            {"doc_id": pa.array(ids), "tokens": pa.array(seqs, type=pa.list_(pa.int32()))}
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        got = (
            sequence_dedup(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        exp = pd.DataFrame(
            {
                "doc_id": [ids[0], ids[2], ids[3], ids[4]],
                "group_size": np.array([3, 1, 1, 2], dtype=np.int64),
            }
        )
        pd.testing.assert_frame_equal(got, exp)


class TestZOrderKey:
    def test_interleave_matches_python_reference(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.partition import zorder_key

        rng = np.random.default_rng(4)
        x = rng.uniform(0, 100, 500)
        y = rng.uniform(-5, 5, 500)
        ds = _docs_ds({"x": x, "y": y}).repartition(4)
        got = zorder_key(ds, ["x", "y"], bits=8).to_pandas()

        def ref(xv, yv):
            qs = []
            for v, lo, hi in ((xv, x.min(), x.max()), (yv, y.min(), y.max())):
                span = hi - lo if hi > lo else 1.0
                qs.append(int(min(max(np.floor((v - lo) * 256 / span), 0), 255)))
            z = 0
            for i, q in enumerate(qs):
                for j in range(8):
                    z |= ((q >> j) & 1) << (j * 2 + i)
            return z

        got = got.sort_values(["x", "y"]).reset_index(drop=True)
        order = np.lexsort((y, x))
        for row, idx in zip(got.itertuples(), order):
            assert row.z == ref(x[idx], y[idx])

    def test_zorder_sort_improves_locality(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.partition import zorder_key

        # grid points: after a z-sort, consecutive rows must be closer on
        # average (in max-norm) than the column-major baseline ordering
        g = np.arange(32)
        xx, yy = np.meshgrid(g, g)
        x, y = xx.ravel().astype(float), yy.ravel().astype(float)
        ds = _docs_ds({"x": x, "y": y})
        df = (
            zorder_key(ds, ["x", "y"], bits=5)
            .to_pandas()
            .sort_values("z")
            .reset_index(drop=True)
        )

        def mean_chunk_bbox(xs, ys, chunk=16):
            sides = []
            for i in range(0, len(xs), chunk):
                cx, cy = xs[i : i + chunk], ys[i : i + chunk]
                sides.append(max(cx.max() - cx.min(), cy.max() - cy.min()))
            return float(np.mean(sides))

        # 16 consecutive z-sorted grid points stay inside a small block in
        # BOTH dimensions (that's the point of the layout key); a seeded
        # random ordering spreads each chunk across most of the grid
        z_side = mean_chunk_bbox(df["x"].to_numpy(), df["y"].to_numpy())
        rng2 = np.random.default_rng(0)
        perm = rng2.permutation(len(x))
        r_side = mean_chunk_bbox(x[perm], y[perm])
        assert z_side <= 8.0 < r_side


class TestWindowDistinct:
    def test_matches_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            t_window_distinct,
        )

        sf = "/root/testdata/sf0.001"
        got = t_window_distinct(sf).to_pandas().reset_index(drop=True)
        ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
        win = (ev["ts"].astype("int64") // 3_600_000_000).to_numpy()
        exp = (
            pd.DataFrame({"win": win, "user_id": ev["user_id"]})
            .groupby("win")["user_id"]
            .nunique()
            .reset_index(name="n_users")
            .sort_values("win")
            .reset_index(drop=True)
        )
        exp["n_users"] = exp["n_users"].astype(np.int64)
        pd.testing.assert_frame_equal(got, exp)


class TestRemoveDupSpans:
    def test_cuts_all_but_first_and_merges_overlaps(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.dedup import remove_dup_spans

        dup = "a b c d e"                       # the duplicated 5-gram
        docs = {
            0: f"start {dup} end",               # first occurrence -> kept
            1: f"x {dup} y",                     # later occurrence -> cut
            2: f"{dup} f {dup}",                 # two occurrences, both later
            3: "totally unique words here only today",
            4: "short",
        }
        ds = _docs_ds(
            {
                "doc_id": np.array(sorted(docs), dtype=np.int64),
                "text": np.array([docs[i] for i in sorted(docs)], dtype=object),
            }
        ).repartition(3)
        got = (
            remove_dup_spans(ds, shingle_words=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 2 also contains "e f a" bridging 5-grams ("b c d e f",
        # "c d e f a", ...) that are unique -> only the two exact dup
        # spans are cut; overlap merging keeps 'f' (covered? positions
        # 0-4 and 6-10 cut, position 5 = 'f' survives)
        exp = {
            0: (docs[0], 0),
            1: ("x y", 5),
            2: ("f", 10),
            3: (docs[3], 0),
            4: ("short", 0),
        }
        for i in sorted(docs):
            row = got[got["doc_id"] == i].iloc[0]
            assert row["text"] == exp[i][0], (i, row["text"])
            assert row["n_removed"] == exp[i][1], (i, row["n_removed"])


class TestCurationPipeline:
    def test_stage_invariants_at_sf0001(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            d_curation_pipeline,
        )

        got = d_curation_pipeline("/root/testdata/sf0.001").to_pandas()
        # dedup: the 7 injected boilerplate templates collapse to <= 7
        # survivors among the doc_id % 4 == 1 slice
        injected = got[got["doc_id"] % 4 == 1]
        assert 1 <= len(injected) <= 7
        # packing arithmetic: seq bounds derive from tok_start and the
        # doc sizes; offsets must tile the stream without overlap
        order = got.sort_values("tok_start")
        starts = order["tok_start"].to_numpy()
        assert (np.diff(starts) > 0).all()
        assert (order["seq_first"].to_numpy() == starts // 2048).all()
        assert (order["n_seqs"] >= 1).all()
        # every survivor passed the filter: no doc shorter than 30 words
        # exists in the output (spot via the injected rows' fixed size)
        assert got["doc_id"].is_unique


class TestAuditAndLengthBuckets:
    def test_audit_matches_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import q_audit

        sf = "/root/testdata/sf0.001"
        got = q_audit(sf).set_index("check")
        orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_custkey"])
        cust = set(pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])["c_custkey"])
        assert got.loc["fk_orders_customer", "n_bad"] == int(
            (~orders["o_custkey"].isin(cust)).sum()
        )
        assert got.loc["fk_orders_customer", "n_total"] == len(orders)
        part = pd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey"])
        vc = part["p_partkey"].value_counts()
        assert got.loc["dup_part_keys", "n_bad"] == int((vc[vc > 1] - 1).sum())
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        blank = int((docs["text"].isna() | (docs["text"].fillna("").str.strip() == "")).sum())
        assert got.loc["blank_document_text", "n_bad"] == blank

    def test_length_buckets_match_bruteforce(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            d_length_buckets,
        )

        sf = "/root/testdata/sf0.001"
        got = d_length_buckets(sf).to_pandas().set_index("bucket_cap")
        n = np.maximum(
            pd.read_parquet(f"{sf}/documents.parquet", columns=["n_chars"])["n_chars"].to_numpy(),
            1,
        )
        cap = np.int64(1) << np.ceil(np.log2(n)).astype(np.int64)
        exp = pd.DataFrame({"cap": cap, "pad": cap - n}).groupby("cap").agg(
            n_docs=("pad", "size"), pad_waste=("pad", "sum")
        )
        for c, row in exp.iterrows():
            assert got.loc[c, "n_docs"] == row["n_docs"]
            assert got.loc[c, "pad_waste"] == row["pad_waste"]


class TestGroupSplitAndHistogram:
    def test_group_split_is_leakage_safe(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import d_group_split
        from complexity_driven_feature_construction_ray.stages.sampling import det_hash_u32

        sf = "/root/testdata/sf0.001"
        got = d_group_split(sf).set_index("split")
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["source", "n_chars"])
        gid = docs["source"].str.slice(3).astype(np.int64).to_numpy()
        train = det_hash_u32(gid, 13) % np.uint64(10) < np.uint64(8)
        # every source entirely on one side (the predicate depends only
        # on the group), and the per-split report matches brute force
        side = pd.DataFrame({"s": docs["source"], "t": train}).groupby("s")["t"].nunique()
        assert (side == 1).all()
        for split, mask in (("train", train), ("valid", ~train)):
            if mask.sum() == 0:
                assert split not in got.index
                continue
            assert got.loc[split, "n_docs"] == int(mask.sum())
            assert got.loc[split, "n_sources"] == docs.loc[mask, "source"].nunique()
            assert got.loc[split, "n_chars"] == int(docs.loc[mask, "n_chars"].sum())

    def test_histogram_matches_numpy(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.stats import histogram

        rng = np.random.default_rng(8)
        x = np.concatenate([rng.uniform(0, 100, 3000), [0.0, 100.0]])
        ds = _docs_ds({"v": x}).repartition(5)
        got = histogram(ds, col="v", bins=10)
        idx = np.clip(np.floor((x - 0.0) * 10 / 100.0).astype(int), 0, 9)
        exp = np.bincount(idx, minlength=10)
        assert (got["n"].to_numpy() == exp).all()
        assert got["n"].sum() == len(x)  # max value lands in the last bin
        assert got.loc[9, "bin_hi"] == 100.0
