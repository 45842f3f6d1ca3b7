"""Kendall tau-b / vocab coverage curve / Bowley skewness vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kendall_tau_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_kendall_tau,
    )

    out = q_kendall_tau(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_discount"])
    x = li["l_quantity"].to_numpy(np.int64)
    y = np.floor(li["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
    n = len(x)
    # brute force over the (tiny) joint grid
    from collections import Counter
    cell = Counter(zip(x, y))
    keys = list(cell)
    C = D = 0
    for i, (xa, ya) in enumerate(keys):
        for xb, yb in keys:
            if xa < xb and ya < yb:
                C += cell[(xa, ya)] * cell[(xb, yb)]
            elif xa < xb and ya > yb:
                D += cell[(xa, ya)] * cell[(xb, yb)]
    n0 = n * (n - 1) // 2
    tx = Counter(x)
    ty = Counter(y)
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (C - D) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert int(out["n"]) == n
    assert int(out["concordant"]) == C and int(out["discordant"]) == D
    assert int(out["ties_x"]) == n1 and int(out["ties_y"]) == n2
    assert abs(out["tau_b"] - tau) < 5e-6
    assert -1.0 - 1e-9 <= out["tau_b"] <= 1.0 + 1e-9


def test_vocab_coverage_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_vocab_coverage,
    )

    out = d_vocab_coverage(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter
    cnt = Counter()
    for t in docs["text"]:
        cnt.update((t or "").split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    vocab = len(ranked)
    exp_ks = [k for k in (1, 2, 4, 8, 16, 32, 64, 128, 256) if k <= vocab]
    assert list(out["k"]) == exp_ks
    for _, r in out.iterrows():
        mass = sum(c for _, c in ranked[:int(r["k"])])
        assert int(r["mass"]) == mass
        assert int(r["vocab"]) == vocab
        assert abs(r["coverage"] - mass / total) < 5e-6
    # coverage is monotone and ends below/at 1
    cov = out["coverage"].to_numpy()
    assert (np.diff(cov) >= -1e-9).all() and cov[-1] <= 1.0 + 1e-9


def test_bowley_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_bowley

    out = q_bowley(SF).set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    li = li.assign(v=np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
                   .astype(np.int64))
    for f, g in li.groupby("l_returnflag"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        q1 = int(v[-(-n // 4) - 1])
        q2 = int(v[-(-n // 2) - 1])
        q3 = int(v[-(-(3 * n) // 4) - 1])
        assert int(out.loc[f, "q1"]) == q1
        assert int(out.loc[f, "q2"]) == q2
        assert int(out.loc[f, "q3"]) == q3
        if q3 != q1:
            assert abs(out.loc[f, "bowley"]
                       - (q1 + q3 - 2 * q2) / (q3 - q1)) < 5e-6
        assert -1.0 - 1e-9 <= out.loc[f, "bowley"] <= 1.0 + 1e-9
