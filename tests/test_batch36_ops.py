"""SPRT / dedup threshold curve / Cohen's d vs brute-force references
at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_sprt_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_sprt

    out = t_sprt(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "event_type"])
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    order = np.lexsort((ev["event_id"].to_numpy(np.int64), us))
    hit = (ev["event_type"].to_numpy(object)[order] == "purchase")
    a = np.log(0.2 / 0.1)
    b = np.log(0.8 / 0.9)
    bound = np.log(19.0)
    llr = np.cumsum(np.where(hit, a, b))
    crossed = np.nonzero((llr >= bound - 1e-4) | (llr <= -bound + 1e-4))[0]
    # the engine uses micro-quantized increments; decisions must agree
    assert out["decision"] in ("accept_h0", "accept_h1", "continue")
    if len(crossed):
        i = int(crossed[0])
        exp = "accept_h1" if llr[i] > 0 else "accept_h0"
        assert out["decision"] == exp
        assert abs(int(out["n_at_decision"]) - (i + 1)) <= 2  # quantizer slack
    # LLR at decision is consistent with counts
    n, k = int(out["n_at_decision"]), int(out["k_at_decision"])
    a_mic = int(np.floor(a * 1e6 + 0.5005))
    b_mic = int(np.floor(b * 1e6 + 0.5005))
    assert abs(out["llr"] - (k * a_mic + (n - k) * b_mic) / 1e6) < 1e-9


def test_dup_threshold_curve_matches_pairs(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_dup_threshold_curve,
        d_jaccard,
    )

    out = d_dup_threshold_curve(SF).set_index("tau")
    pairs = d_jaccard(SF).to_pandas()
    j = pairs["jaccard"].to_numpy()
    for t10 in range(1, 10):
        tau = t10 / 10
        assert int(out.loc[tau, "n_pairs"]) == len(j)
        assert int(out.loc[tau, "n_dup"]) == int((j >= tau).sum())
    # yield is non-increasing in tau
    nd = out.sort_index()["n_dup"].to_numpy()
    assert (np.diff(nd) <= 0).all()


def test_cohens_d_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cohens_d,
    )

    out = q_cohens_d(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    c = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    t = ev["user_id"].to_numpy() % 2 == 1
    x, y = c[t], c[~t]
    sp = np.sqrt(((len(x) - 1) * x.var(ddof=1)
                  + (len(y) - 1) * y.var(ddof=1)) / (len(x) + len(y) - 2))
    d = (x.mean() - y.mean()) / sp
    assert int(out["n_t"]) == len(x) and int(out["n_c"]) == len(y)
    assert abs(out["mean_t"] - x.mean() / 100) < 5e-6
    assert abs(out["mean_c"] - y.mean() / 100) < 5e-6
    assert abs(out["cohens_d"] - d) < 5e-6
