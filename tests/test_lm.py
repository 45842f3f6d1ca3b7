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
