"""build_vocab/vocab_encode and profile_columns vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.stats import profile_columns
from complexity_driven_feature_construction_ray.stages.text import build_vocab, vocab_encode


def test_vocab_encode_matches_bruteforce():
    rng = np.random.default_rng(2)
    vocab = [f"v{i}" for i in range(20)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(1, 30))) for _ in range(150)]
    docs.append("")  # empty doc: n_tok 0, sentinels -1
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)

    toks, ids = build_vocab(ds)
    # brute-force id assignment: count desc, token asc
    flat = " ".join(docs).split()
    vc = pd.Series(flat).value_counts()
    ranked = sorted(vc.index, key=lambda t: (-vc[t], t))
    id_of = {t: i for i, t in enumerate(ranked)}
    assert {t: i for t, i in zip(toks, ids)} == id_of

    got = (
        vocab_encode(ds, toks, ids, with_ids=True)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, t in enumerate(docs):
        ws = t.split()
        exp_ids = [id_of[w] for w in ws]
        row = got.iloc[i]
        assert row["n_tok"] == len(ws)
        assert list(row["ids"]) == exp_ids
        assert row["ids_sum"] == sum(exp_ids)
        assert row["ids_min"] == (min(exp_ids) if exp_ids else -1)
        assert row["ids_max"] == (max(exp_ids) if exp_ids else -1)


def test_vocab_encode_oov_encodes_minus_one():
    train = pd.DataFrame({"doc_id": [0], "text": ["aa bb cc"]})
    tds = ray.data.from_arrow(pa.Table.from_pandas(train, preserve_index=False))
    toks, ids = build_vocab(tds)
    new = pd.DataFrame({"doc_id": [1], "text": ["aa zz bb"]})
    nds = ray.data.from_arrow(pa.Table.from_pandas(new, preserve_index=False))
    got = vocab_encode(nds, toks, ids, with_ids=True).to_pandas()
    enc = list(got.iloc[0]["ids"])
    assert enc[1] == -1 and enc[0] != -1 and enc[2] != -1
    # OOV excluded from checksums but counted in n_tok
    assert got.iloc[0]["n_tok"] == 3
    assert got.iloc[0]["ids_sum"] == enc[0] + enc[2]


def test_profile_columns_matches_bruteforce():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.normal(size=1000),
            "b": rng.integers(0, 50, 1000).astype(np.float64),
            "empty": np.full(1000, np.nan),
        }
    )
    df.loc[df.index % 9 == 0, "a"] = np.nan
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = profile_columns(ds, ["a", "b", "empty"]).to_pandas().set_index("col")
    av = df["a"].dropna()
    assert got.loc["a", "n"] == 1000
    assert got.loc["a", "n_null"] == (df.index % 9 == 0).sum()
    assert np.isclose(got.loc["a", "v_min"], av.min())
    assert np.isclose(got.loc["a", "v_max"], av.max())
    assert np.isclose(got.loc["a", "v_mean"], round(av.mean(), 6), atol=1e-6)
    assert got.loc["b", "n_null"] == 0
    assert np.isclose(got.loc["b", "v_mean"], round(df["b"].mean(), 6), atol=1e-6)
    # all-null column: extremes and mean are NULL, counts exact
    assert got.loc["empty", "n_null"] == 1000
    assert np.isnan(got.loc["empty", "v_min"])
    assert np.isnan(got.loc["empty", "v_mean"])
