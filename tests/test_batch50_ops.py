"""Batch 50: Spearman rho, Theil's U, Gini vs brute force at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_spearman_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_spearman_price,
    )

    out = q_spearman_price(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    x = np.floor(li["l_quantity"].to_numpy() + 0.5)
    y = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    ref = np.corrcoef(rx, ry)[0, 1]
    assert out["n"].iloc[0] == len(li)
    assert abs(out["spearman_rho"].iloc[0] - ref) < 2e-6
    assert -1.0 - 1e-9 <= out["spearman_rho"].iloc[0] <= 1.0 + 1e-9


def test_theil_u_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_theil_u,
    )

    out = q_theil_u(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    n = len(docs)
    joint = docs.groupby(["lang", "source"]).size()
    rl = docs.groupby("lang").size()
    cl = docs.groupby("source").size()
    mi = sum((nij / n) * np.log(n * nij / (rl[la] * cl[so]))
             for (la, so), nij in joint.items())
    hx = -sum((r / n) * np.log(r / n) for r in rl)
    assert out["n"].iloc[0] == n
    assert abs(out["h_lang"].iloc[0] - hx) < 5e-5
    assert abs(out["mi"].iloc[0] - mi) < 5e-5
    assert abs(out["theil_u"].iloc[0] - mi / hx) < 5e-5
    # U is a normalized ratio: 0 <= U <= 1
    assert -1e-9 <= out["theil_u"].iloc[0] <= 1.0 + 1e-9


def test_gini_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_gini,
    )

    out = q_gini(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100 + 0.5
                           ).astype(np.int64)
    per = od.groupby("o_custkey")["cents"].sum().to_numpy(np.int64)
    xs = np.sort(per).astype(np.float64)
    n = len(xs)
    i = np.arange(1, n + 1, dtype=np.float64)
    ref = (2 * (i * xs).sum() - (n + 1) * xs.sum()) / (n * xs.sum())
    assert out["n_cust"].iloc[0] == n
    assert out["total_cents"].iloc[0] == int(per.sum())
    assert abs(out["gini"].iloc[0] - ref) < 2e-6
    assert 0.0 <= out["gini"].iloc[0] < 1.0


def test_gini_tie_order_invariance(ray_session):
    """Equal values commute inside a tie block: the rank-weighted sum
    is invariant to how ties are ordered, so no tie-break is needed."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 5, size=200).astype(np.int64)  # heavy ties
    n = len(x)

    def gini_of(order):
        xs = x[order].astype(np.float64)
        i = np.arange(1, n + 1, dtype=np.float64)
        return (2 * (i * xs).sum() - (n + 1) * xs.sum()) / (n * xs.sum())

    a = np.argsort(x, kind="stable")
    # same sorted multiset, different order inside tie blocks
    b = np.lexsort((rng.permutation(n), x))
    assert abs(gini_of(a) - gini_of(b)) < 1e-12
