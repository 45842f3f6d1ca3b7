"""inverted_index and blocked_fuzzy_join vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.text import (
    blocked_fuzzy_join,
    inverted_index,
    levenshtein_to_candidates,
)


def test_inverted_index_matches_bruteforce():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
        for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": docs})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    got = (
        inverted_index(ds, num_buckets=3)
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    exp_rows = []
    for tok in sorted(set(" ".join(docs).split())):
        ids = sorted(i for i, t in enumerate(docs) if tok in t.split())
        exp_rows.append((tok, len(ids), ",".join(map(str, ids))))
    exp = pd.DataFrame(exp_rows, columns=["token", "df", "postings"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_inverted_index_multi_occurrence_ships_once():
    df = pd.DataFrame({"doc_id": [7], "text": ["dup dup dup solo"]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = inverted_index(ds, num_buckets=2).to_pandas().set_index("token")
    assert got.loc["dup", "df"] == 1
    assert got.loc["dup", "postings"] == "7"


def _bf_best(queries: list[str], cands: list[str], k: int):
    cands = sorted(cands)
    d = levenshtein_to_candidates(pd.Series(queries), cands)
    best = d.argmin(axis=1)
    dist = d[np.arange(len(queries)), best]
    return [
        (q, cands[b], int(dd)) for q, b, dd in zip(queries, best, dist) if dd <= k
    ]


def test_blocked_fuzzy_join_matches_bruteforce():
    rng = np.random.default_rng(9)
    cands = ["table", "chair", "lamp", "sofa", "stool", "shelf", "bench", "desk"]
    # queries: exact, 1-typo (drop/replace/insert), and far-off strings
    queries = []
    for i in range(200):
        c = cands[rng.integers(0, len(cands))]
        r = rng.integers(0, 4)
        if r == 0:
            queries.append(c)
        elif r == 1:
            queries.append(c[:-1])
        elif r == 2:
            j = rng.integers(0, len(c))
            queries.append(c[:j] + "x" + c[j + 1:])
        else:
            queries.append("zzz" + c)  # distance 3: must NOT match at k=1
    left = pd.DataFrame(
        {"qid": np.arange(len(queries), dtype=np.int64), "q": queries}
    )
    right = pd.DataFrame({"name": cands * 3})  # duplicates must not matter
    lds = ray.data.from_arrow(pa.Table.from_pandas(left, preserve_index=False)).repartition(4)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right, preserve_index=False)).repartition(2)
    got = (
        blocked_fuzzy_join(
            lds, rds, left_col="q", right_col="name", left_id="qid", max_dist=1,
            num_buckets=4,
        )
        .to_pandas().sort_values("qid").reset_index(drop=True)
    )
    exp = []
    d = levenshtein_to_candidates(pd.Series(queries), sorted(set(cands)))
    sc = sorted(set(cands))
    for i in range(len(queries)):
        b = d[i].argmin()
        if d[i][b] <= 1:
            exp.append((i, queries[i], sc[b], int(d[i][b])))
    expdf = pd.DataFrame(exp, columns=["qid", "q", "best_match", "dist"])
    pd.testing.assert_frame_equal(got, expdf, check_dtype=False)
    # the far-off strings were dropped (inner-join semantics)
    assert not got["q"].str.startswith("zzz").any()
