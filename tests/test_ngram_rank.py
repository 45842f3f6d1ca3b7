"""n-gram repetition signals + percent_rank/cume_dist vs hand-computed."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_ngram_repetition_known_values(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import ngram_repetition_stats

    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c a b c x",      # "a b c" twice: covers a,b,c,a,b,c (6 chars of 7)
            "p q r s",            # all trigrams unique -> dup 0; top = 3/4
            "zz yy",              # fewer than 3 words -> both 0
            "",                   # empty -> both 0
        ],
    })
    out = ngram_repetition_stats(batch).to_pandas()
    # doc 1: total chars 7; dup-covered words: positions 0..5 -> 6 chars
    assert abs(out.loc[0, "dup_ngram_char_frac"] - 6 / 7) < 2e-6
    # top trigram "a b c" count 2, word chars 3 -> 6/7
    assert abs(out.loc[0, "top_ngram_char_frac"] - 6 / 7) < 2e-6
    assert out.loc[1, "dup_ngram_char_frac"] == 0
    assert abs(out.loc[1, "top_ngram_char_frac"] - 3 / 4) < 2e-6
    assert out.loc[2, "top_ngram_char_frac"] == 0
    assert out.loc[3, "dup_ngram_char_frac"] == 0


def test_ngram_overlapping_coverage_no_double_count(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import ngram_repetition_stats

    # "a a a a a": every trigram is "a a a" (3 occurrences) -> coverage
    # is the UNION of positions = all 5 words, not 9
    batch = pa.table({"doc_id": [1], "text": ["a a a a a"]})
    out = ngram_repetition_stats(batch).to_pandas()
    assert abs(out.loc[0, "dup_ngram_char_frac"] - 1.0) < 2e-6


def test_percent_rank_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_percent_rank

    out = t_percent_rank("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "value"])
    g = ev.groupby("user_id")["value"]
    n = g.transform("size").to_numpy(np.float64)
    pr = (g.rank(method="min").to_numpy() - 1) / np.maximum(n - 1, 1)
    cd = g.rank(method="max").to_numpy() / n
    exp = ev.assign(pr=pr, cd=cd).sort_values("event_id")
    np.testing.assert_allclose(out["percent_rank"].to_numpy(),
                               exp["pr"].to_numpy(), atol=2e-6)
    np.testing.assert_allclose(out["cume_dist"].to_numpy(),
                               exp["cd"].to_numpy(), atol=2e-6)
    # single-event users give percent_rank 0, cume_dist 1
    solo = exp[n == 1]
    if len(solo):
        got = out.set_index("event_id").loc[solo["event_id"]]
        assert (got["percent_rank"] == 0).all()
        assert (got["cume_dist"] == 1).all()
