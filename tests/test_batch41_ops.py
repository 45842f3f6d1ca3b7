"""Tukey fences / distinctive tokens vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_tukey_fences_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_tukey_fences,
    )

    out = q_tukey_fences(SF).set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    li = li.assign(v=np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
                   .astype(np.int64))
    for f, g in li.groupby("l_returnflag"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        q1 = int(v[-(-n // 4) - 1])
        q3 = int(v[-(-(3 * n) // 4) - 1])
        iqr = q3 - q1
        lo = int((2 * g["v"] < 2 * q1 - 3 * iqr).sum())
        hi = int((2 * g["v"] > 2 * q3 + 3 * iqr).sum())
        assert int(out.loc[f, "q1"]) == q1 and int(out.loc[f, "q3"]) == q3
        assert int(out.loc[f, "iqr"]) == iqr
        assert int(out.loc[f, "low_outliers"]) == lo
        assert int(out.loc[f, "high_outliers"]) == hi
        assert lo + hi <= n


def test_distinctive_tokens_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_distinctive_tokens,
    )

    out = d_distinctive_tokens(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    per_src, corpus = {}, Counter()
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update((t or "").split())
        per_src[src] = cnt
        corpus.update(cnt)
    n_c = sum(corpus.values())

    def q6(x):
        return np.floor(x * 1e6 + 0.5005) / 1e6

    for src, cnt in per_src.items():
        ns = sum(cnt.values())
        lifts = [(q6((n / ns) / (corpus[t] / n_c)), t, n)
                 for t, n in cnt.items() if corpus[t] >= 5]
        top = sorted(lifts, key=lambda x: (-x[0], x[1]))[:3]
        got = out[out["source"] == src].sort_values("rank")
        assert len(got) == min(3, len(lifts))
        for (lift, tok, n), (_, row) in zip(top, got.iterrows()):
            assert row["tok"] == tok
            assert int(row["n_in_source"]) == n
            assert abs(row["lift"] - lift) < 1e-9
            assert row["lift"] >= 1.0 - 1e-6 or len(lifts) < 3
