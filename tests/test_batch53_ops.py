"""Batch 53: Cochran-Armitage, capture-recapture, Markov stationary."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cochran_armitage_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cochran_armitage,
    )

    out = q_cochran_armitage(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])
    w = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    succ = (li["l_returnflag"] == "R").to_numpy()
    groups = pd.DataFrame({"w": w, "s": succ}).groupby("w")["s"]
    ni = groups.count().astype(float)
    ri = groups.sum().astype(float)
    ws = ni.index.to_numpy(float)
    N, R = ni.sum(), ri.sum()
    pbar = R / N
    t = (ws * (ri - ni * pbar)).sum()
    var = pbar * (1 - pbar) * ((ws ** 2 * ni).sum() - (ws * ni).sum() ** 2 / N)
    ref = t / np.sqrt(var)
    assert out["n_rows"].iloc[0] == int(N)
    assert out["n_success"].iloc[0] == int(R)
    assert abs(out["trend_z"].iloc[0] - ref) < 1e-4


def test_capture_recapture_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_capture_recapture,
    )

    out = q_capture_recapture(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_orderkey"])
    s1 = set(li.loc[li["l_orderkey"] % 2 == 1, "l_partkey"])
    s2 = set(li.loc[li["l_orderkey"] % 2 == 0, "l_partkey"])
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    assert out["n_sample1"].iloc[0] == n1
    assert out["n_sample2"].iloc[0] == n2
    assert out["n_both"].iloc[0] == m
    assert out["n_true_distinct"].iloc[0] == len(s1 | s2)
    ref = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert abs(out["chapman_estimate"].iloc[0] - ref) < 2e-6
    # the estimate should land in a sane band around the truth
    assert 0.5 * len(s1 | s2) < out["chapman_estimate"].iloc[0] \
        < 2.0 * len(s1 | s2)


def test_markov_stationary_matches_float_fixpoint(ray_session):
    """The exact-integer iteration tracks the float power iteration
    to within the micro-unit truncation (<= iters * S * 1e-9 mass
    drift, far below 1e-4), and the result is near-invariant under
    one more float transition step."""
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_markov_stationary,
    )

    out = t_markov_stationary(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    from collections import Counter
    trans = Counter()
    for _, g in ev.groupby("user_id"):
        ets = g["event_type"].tolist()
        for a, b in zip(ets, ets[1:]):
            trans[(a, b)] += 1
    states = sorted(ev["event_type"].unique())
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), c in trans.items():
        P[idx[a], idx[b]] = c
    rows = P.sum(axis=1)
    for i, r in enumerate(rows):
        if r > 0:
            P[i] /= r
        else:
            P[i, i] = 1.0
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(20):
        v = v @ P
    v = v / v.sum()
    got = out.set_index("event_type")["stationary_p"].loc[states].to_numpy()
    assert np.abs(got - v).max() < 1e-4
    # near-fixpoint: one more transition step barely moves it
    assert np.abs(got @ P - got).max() < 5e-3
    assert abs(got.sum() - 1.0) < 1e-5


def test_markov_stationary_micro_mass_conserved(ray_session):
    """Every iteration only floor-divides (one floor per transition
    edge), so total micro mass can shrink by at most S² per step —
    the integer trajectory cannot blow up or lose meaningful mass
    over 20 steps."""
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_markov_stationary,
    )

    out = t_markov_stationary(SF)
    s = len(out)
    tot = int(out["v_micro"].sum())
    assert 10**9 - 20 * s * s - s <= tot <= 10**9
