"""Bigram LM fit/score vs hand-computed probabilities."""

import numpy as np
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.lm import (
    fit_bigram_lm,
    score_bigram_lm,
)


def _ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})
    )


def test_hand_computed_two_docs():
    # corpus: "a b a" and "b a" -> unigrams a:3 b:2 (V=2)
    # bigrams: (a b):1 (b a):2
    ds = _ds(["a b a", "b a"])
    lm = fit_bigram_lm(ds, alpha=0.5)
    assert lm.vocab == 2
    out = score_bigram_lm(ds, lm).to_pandas().set_index("doc_id")
    a, b, V, al = 3, 2, 2, 0.5
    nll_ab = np.log(a + al * V) - np.log(1 + al)  # p(b|a)
    nll_ba = np.log(b + al * V) - np.log(2 + al)  # p(a|b)
    exp0 = round((nll_ab + nll_ba) / 2, 6)
    exp1 = round(nll_ba, 6)
    assert out.loc[0, "n_bigrams"] == 2 and abs(out.loc[0, "avg_nll"] - exp0) < 1e-9
    assert out.loc[1, "n_bigrams"] == 1 and abs(out.loc[1, "avg_nll"] - exp1) < 1e-9


def test_short_docs_dropped():
    ds = _ds(["", "solo", "two words"])
    lm = fit_bigram_lm(ds)
    out = score_bigram_lm(ds, lm).to_pandas()
    assert out["doc_id"].tolist() == [2]  # only the doc with a bigram


def test_unseen_bigrams_get_floor_probability():
    train = _ds(["x y x y"])
    lm = fit_bigram_lm(train, alpha=0.5)
    test = _ds(["q r"], ids=[9])  # neither bigram nor context seen
    out = score_bigram_lm(test, lm).to_pandas()
    # c_bi=0, c_ctx=0 -> nll = ln(0 + 0.5*V) - ln(0.5) = ln(V)
    assert abs(out.loc[0, "avg_nll"] - round(np.log(lm.vocab), 6)) < 1e-9


def test_min_count_prunes_tail():
    ds = _ds(["a b", "a b", "c d"])
    lm = fit_bigram_lm(ds, min_count=2)
    assert len(lm.bi_keys) == 1  # only (a b) survives
    assert lm.vocab == 0 or lm.vocab == len(lm.uni_keys)


def test_fit_is_deterministic_across_runs():
    texts = [f"tok{i % 7} tok{(i * 3) % 7} tok{(i * 5) % 7}" for i in range(50)]
    lm1 = fit_bigram_lm(_ds(texts))
    lm2 = fit_bigram_lm(_ds(texts))
    assert np.array_equal(lm1.bi_keys, lm2.bi_keys)
    assert np.array_equal(lm1.bi_counts, lm2.bi_counts)
    assert lm1.vocab == lm2.vocab


class TestTrigramStupidBackoff:
    def test_matches_pure_python_including_backoff_chain(self, ray_session):
        from collections import Counter

        from complexity_driven_feature_construction_ray.stages.lm import (
            fit_trigram_lm,
            score_trigram_lm,
        )

        train = [
            "the cat sat on the mat",
            "the cat sat on a hat",
            "a dog sat on the mat",
        ]
        # held-out: hits trigram branch, bigram backoff, and unigram backoff
        test = [
            "the cat sat on the mat",     # all trigrams seen
            "the cat ate on the mat",     # 'cat ate on' unseen -> backoff
            "zebra quark sat dog hat a",  # mostly unseen -> deep backoff
        ]
        tr = _ds(train)
        te = _ds(test)
        lm = fit_trigram_lm(tr)
        got = score_trigram_lm(te, lm).to_pandas().sort_values("doc_id").reset_index(drop=True)

        def grams(ts, k):
            c = Counter()
            for t in ts:
                ws = t.split()
                for i in range(len(ws) - k + 1):
                    c[tuple(ws[i : i + k])] += 1
            return c
        u, b2, t3 = grams(train, 1), grams(train, 2), grams(train, 3)
        N = sum(u.values())

        def s(w1, w2, w3):
            if t3[(w1, w2, w3)] > 0 and b2[(w1, w2)] > 0:
                return t3[(w1, w2, w3)] / b2[(w1, w2)]
            if b2[(w2, w3)] > 0:
                return 0.4 * b2[(w2, w3)] / u[(w2,)]
            return 0.16 * u[(w3,)] / N

        for di, txt in enumerate(test):
            ws = txt.split()
            nll = [
                -np.log(max(s(ws[i], ws[i + 1], ws[i + 2]), 1e-300))
                for i in range(len(ws) - 2)
            ]
            row = got[got["doc_id"] == di].iloc[0]
            assert row["n_trigrams"] == len(nll)
            assert row["avg_nll"] == round(float(np.mean(nll)), 6), (di, row["avg_nll"], np.mean(nll))
