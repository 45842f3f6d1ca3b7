"""KMV sketch / two-proportion z-test / gains table vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _mod61(x: int) -> int:
    return x % ((1 << 61) - 1)


def test_kmv_matches_bruteforce_hashes(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_kmv_distinct

    out = d_kmv_distinct(SF)  # keep per-column dtypes (a row Series
    # would upcast the exact int64 hash to float64)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_partkey"])
    keys = sorted(set(int(k) for k in li["l_partkey"]))
    hs = sorted(_mod61(k * 1442695040888963407 + 1752450205419405103)
                for k in keys)
    k = min(256, len(hs))
    assert int(out["n_sketch"].iloc[0]) == k
    assert int(out["kth_hash"].iloc[0]) == hs[k - 1]
    exact = len(keys)
    if k < 256:
        assert float(out["est_distinct"].iloc[0]) == float(k) == float(exact)
    else:
        est = 255.0 * (float((1 << 61) - 1) / float(hs[255]))
        assert abs(float(out["est_distinct"].iloc[0]) - est) < 2e-6
        # KMV with k=256 has ~1/sqrt(k-2) ≈ 6.3% std error: 25% envelope
        assert abs(est - exact) / exact < 0.25


def test_ab_ztest_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_ab_ztest

    out = d_ab_ztest(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "lang"])
    N = len(docs)
    P = int((docs["lang"] == "en").sum())
    for src, g in docs.groupby("source"):
        n = len(g)
        pos = int((g["lang"] == "en").sum())
        p1, p2 = pos / n, (P - pos) / (N - n)
        pp = P / N
        z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / n + 1 / (N - n)))
        assert int(out.loc[src, "n"]) == n and int(out.loc[src, "pos"]) == pos
        assert abs(out.loc[src, "z"] - z) < 2e-6
    # z-scores over disjoint shards vs rest must roughly balance
    assert abs(out["z"].mean()) < 3.0


def test_gains_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_gains

    out = d_gains(SF).set_index("decile")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice", "l_returnflag"])
    v = li["l_extendedprice"].to_numpy(np.float64)
    pos = (li["l_returnflag"] == "R").to_numpy()
    N, P = len(v), int(pos.sum())
    sv = np.sort(v)
    edges = np.array([sv[-(-(k * N) // 10) - 1] for k in range(1, 10)])
    decile = (v[:, None] > edges[None, :]).sum(axis=1)
    assert int(out["n"].sum()) == N and int(out["pos"].sum()) == P
    for d in range(10):
        m = decile == d
        if not m.any():
            assert d not in out.index
            continue
        assert int(out.loc[d, "n"]) == int(m.sum())
        assert int(out.loc[d, "pos"]) == int(pos[m].sum())
    # top-decile capture equals its share of positives; monotone cumulation
    top = out.sort_index(ascending=False)
    assert np.all(np.diff(top["cum_pos"].to_numpy()) >= 0)
    assert abs(top["capture"].iloc[-1] - 1.0) < 2e-6
    exp_capture = int(pos[decile == top.index[0]].sum()) / P
    assert abs(top["capture"].iloc[0] - exp_capture) < 2e-6


def test_gains_sketch_path_matches_exact(ray_session):
    """The 100TB edge-selection mode (mergeable weighted-value sketch,
    percentile_disc picks over merged partials) must agree with the
    exact value-histogram mode whenever per-batch distincts fit the
    sketch — which they do at test scale, so equality is exact."""
    from complexity_driven_feature_construction_ray.pipelines.relational import d_gains

    a = d_gains(SF, exact_edges=True).reset_index(drop=True)
    b = d_gains(SF, exact_edges=False).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
