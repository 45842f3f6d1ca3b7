"""Batch 91: restricted mean survival time, embedding centroid drift,
Friedman blocked rank test."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rmst_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_rmst,
    )

    out = t_rmst(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(t=us)
    t_end = int(us.max())
    s = ev[ev.event_type == "signup"].groupby("user_id")["t"].min()
    labels = []
    for u, t0 in s.items():
        pur = ev[(ev.user_id == u) & (ev.event_type == "purchase")
                 & (ev.t >= t0)]["t"]
        if len(pur):
            labels.append((int(pur.min() - t0), True))
        else:
            labels.append((int(t_end - t0), False))
    TAU = 604_800_000_000
    durs = np.sort([d for d, _ in labels])
    N = len(durs)
    evd = sorted(d for d, e in labels if e)
    tt, dcnt = np.unique(evd, return_counts=True)
    # step-function KM with the engine's micro-int quantization
    sm_prev, steps, cum, dead = 1_000_000, [], 0, False
    for t, d in zip(tt, dcnt):
        n = int((durs >= t).sum())
        if d >= n:
            dead = True
        if not dead:
            cum += int(np.floor(np.log((n - d) / n) * 1e6 + 0.5005))
            sm = int(np.floor(np.exp(cum / 1e6) * 1e6 + 0.5005))
        else:
            sm = 0
        steps.append((int(t), sm))
    ksteps = [(t, sm) for t, sm in steps if t <= TAU]
    if ksteps:
        area = 1_000_000 * ksteps[0][0]
        for i, (t, sm) in enumerate(ksteps):
            nxt = ksteps[i + 1][0] if i + 1 < len(ksteps) else TAU
            area += sm * (nxt - t)
        km_tau = ksteps[-1][1] / 1e6
    else:
        area, km_tau = 1_000_000 * TAU, 1.0
    row = out.iloc[0]
    assert row["n_subjects"] == N
    assert row["n_steps"] == len(ksteps)
    assert abs(row["km_at_tau"] - km_tau) < 1e-9
    assert abs(row["rmst_days"] - area / 86400e12) < 2e-6


def test_centroid_drift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_centroid_drift,
    )

    out = d_embed_centroid_drift(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    vmax = int(em["vec_id"].max())
    em["half"] = (2 * em["vec_id"] > vmax).astype(int)
    for _, row in out.iterrows():
        sub = em[em["label"] == row["label"]]
        a = np.zeros(len(sub["embedding"].iloc[0]), dtype=object)
        b = np.zeros_like(a)
        na_cnt = nb_cnt = 0
        for _, r in sub.iterrows():
            q = np.floor(np.asarray(r["embedding"], np.float64) * 1e6
                         + 0.5).astype(np.int64)
            if r["half"] == 0:
                a = a + q.astype(object)
                na_cnt += 1
            else:
                b = b + q.astype(object)
                nb_cnt += 1
        dot = int(sum(int(x) * int(y) for x, y in zip(a, b)))
        na = int(sum(int(x) ** 2 for x in a))
        nb = int(sum(int(y) ** 2 for y in b))
        cos = dot / np.sqrt(float(na) * float(nb))
        assert row["n_first"] == na_cnt
        assert row["n_second"] == nb_cnt
        assert abs(row["cos_drift"] - cos) < 2e-6


def test_friedman_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_friedman,
    )

    out = q_friedman(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate", "o_orderpriority",
                                  "o_totalprice"])
    od["m"] = od["o_orderdate"].dt.month
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100
                           + 0.5).astype(np.int64)
    cell = od.groupby(["m", "o_orderpriority"])["cents"] \
        .agg(["sum", "count"])
    prios = sorted(od["o_orderpriority"].unique())
    k = len(prios)
    S = {p: 0 for p in prios}
    nb = 0
    for m in sorted(od["m"].unique()):
        blk = cell.loc[m] if m in cell.index.get_level_values(0) else None
        if blk is None or len(blk) != k:
            continue
        nb += 1
        means = {p: blk.loc[p, "sum"] / blk.loc[p, "count"]
                 for p in prios}
        order = sorted(prios, key=lambda p: means[p])
        # no ties expected in continuous means; doubled rank = 2*rank
        for i, p in enumerate(order):
            S[p] += 2 * (i + 1)
    ss = sum(v * v for v in S.values())
    chi2 = 3 * ss / (nb * k * (k + 1)) - 3 * nb * (k + 1)
    for _, row in out.iterrows():
        p = row["o_orderpriority"]
        assert row["rank2_sum"] == S[p]
        assert abs(row["mean_rank"] - S[p] / (2 * nb)) < 2e-6
        assert abs(row["chi2"] - chi2) < 1e-4
        assert row["n_blocks"] == nb
