"""N-gram overlap curve / Welch's t vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ngram_overlap_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_ngram_overlap_curve,
    )

    out = d_ngram_overlap_curve(SF).set_index("n")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])

    def grams(mask, n):
        s = set()
        for t in docs.loc[mask, "text"]:
            ws = (t or "").split()
            s.update(" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))
        return s

    even = docs["doc_id"] % 2 == 0
    for n in (1, 2, 3):
        a, b = grams(even, n), grams(~even, n)
        inter = len(a & b)
        assert int(out.loc[n, "v_even"]) == len(a)
        assert int(out.loc[n, "v_odd"]) == len(b)
        assert int(out.loc[n, "overlap"]) == inter
        assert abs(out.loc[n, "frac_even"] - inter / len(a)) < 5e-6
        assert abs(out.loc[n, "frac_odd"] - inter / len(b)) < 5e-6
    # memorization-risk shape: overlap fraction non-increasing in n
    fe = out.sort_index()["frac_even"].to_numpy()
    assert (np.diff(fe) <= 1e-9).all()


def test_welch_t_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_welch_t,
    )

    out = q_welch_t(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    c = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    tmask = ev["user_id"].to_numpy() % 2 == 1
    x, y = c[tmask], c[~tmask]
    se1, se0 = x.var(ddof=1) / len(x), y.var(ddof=1) / len(y)
    t = (x.mean() - y.mean()) / np.sqrt(se1 + se0)
    nu = (se1 + se0) ** 2 / (se1 ** 2 / (len(x) - 1)
                             + se0 ** 2 / (len(y) - 1))
    assert int(out["n_t"]) == len(x) and int(out["n_c"]) == len(y)
    assert abs(out["t_stat"] - t) < 5e-5
    assert abs(out["df"] - nu) < 5e-2
    # Welch df is bounded by the pooled df
    assert min(len(x), len(y)) - 1 <= out["df"] <= len(x) + len(y) - 2
