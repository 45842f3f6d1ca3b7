"""snapshot_diff and ngram_novelty vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.dedup import ngram_novelty
from complexity_driven_feature_construction_ray.stages.partition import snapshot_diff


def test_snapshot_diff_matches_bruteforce():
    rng = np.random.default_rng(4)
    keys = np.arange(1000, dtype=np.int64)
    v1 = pd.DataFrame({"k": keys[: 900], "v": rng.normal(size=900)})
    # v2: drop first 50 of v1 (removed), keep 850, change every 7th,
    # add 100 new keys
    v2 = v1.iloc[50:].copy()
    changed = v2["k"].to_numpy() % 7 == 0
    v2.loc[changed, "v"] += 1.0
    v2 = pd.concat(
        [v2, pd.DataFrame({"k": keys[900:], "v": rng.normal(size=100)})],
        ignore_index=True,
    )
    d1 = ray.data.from_arrow(pa.Table.from_pandas(v1, preserve_index=False)).repartition(4)
    d2 = ray.data.from_arrow(pa.Table.from_pandas(v2, preserve_index=False)).repartition(3)
    got = (
        snapshot_diff(d1, d2, key="k", val="v", num_buckets=5)
        .to_pandas().set_index("status")["n"].to_dict()
    )
    assert got == {
        "removed": 50,
        "added": 100,
        "changed": int(changed.sum()),
        "unchanged": 850 - int(changed.sum()),
    }


def test_ngram_novelty_matches_bruteforce():
    rng = np.random.default_rng(6)
    vocab = [f"t{i}" for i in range(15)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(2, 40))) for _ in range(200)]
    ref = docs[:30]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": docs})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    got = (
        ngram_novelty(ds, ref, ngram_words=5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    def grams(t):
        w = t.split()
        return {" ".join(w[i : i + 5]) for i in range(len(w) - 4)}

    refset = set().union(*[grams(t) for t in ref]) if ref else set()
    for i, t in enumerate(docs):
        g = grams(t)
        row = got.iloc[i]
        assert row["n_grams"] == len(g)
        unseen = len(g - refset)
        assert row["n_unseen"] == unseen
        exp = round(unseen / len(g), 6) if g else 0.0
        assert abs(row["novelty"] - exp) < 1e-9
    # reference docs are fully covered -> novelty 0
    assert (got.iloc[:30]["novelty"] == 0.0).all()
