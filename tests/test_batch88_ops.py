"""Batch 88: turning-point randomness test, kNN hubness census,
daily-revenue record statistics."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_turning_points_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_turning_points,
    )

    out = t_turning_points(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    h = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    y = np.zeros(H, np.int64)
    for hv, n in h.value_counts().items():
        y[int(hv) - lo] = n
    turns = 0
    for i in range(1, H - 1):
        if (y[i - 1] < y[i] > y[i + 1]) or (y[i - 1] > y[i] < y[i + 1]):
            turns += 1
    exp = 2 * (H - 2) / 3
    var = (16 * H - 29) / 90
    row = out.iloc[0]
    assert row["n_hours"] == H
    assert row["n_turning"] == turns
    assert abs(row["expected"] - exp) < 2e-6
    assert abs(row["z"] - (turns - exp) / np.sqrt(var)) < 2e-6


def test_knn_hubness_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_hubness,
    )

    out = d_knn_hubness(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    occ = {}
    for qi in np.where(ids < 64)[0]:
        sims = mat @ mat[qi]
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-sims[i], ids[i]))
        for i in order[:5]:
            occ[int(ids[i])] = occ.get(int(ids[i]), 0) + 1
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == len(top)
    lmap = dict(zip(ids, labs))
    for rank, (hid, n) in enumerate(top, 1):
        row = out[out["rank"] == rank].iloc[0]
        assert row["hub_id"] == hid
        assert row["n_occ"] == n
        assert row["label"] == lmap[hid]


def test_record_highs_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_record_highs,
    )

    out = q_record_highs(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_shipdate", "l_extendedprice"])
    d = li["l_shipdate"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    daily = pd.DataFrame({"d": d, "c": c}).groupby("d")["c"].sum() \
        .sort_index()
    best = None
    n_rec = 0
    last = None
    for day, cents in daily.items():
        if best is None or cents > best:
            n_rec += 1
            best = cents
            last = int(day)
    n = len(daily)
    he = sum(1_000_000_000 // k for k in range(1, n + 1))
    h2e = sum(1_000_000_000 // (k * k) for k in range(1, n + 1))
    E = he / 1e9
    V = (he - h2e) / 1e9
    row = out.iloc[0]
    assert row["n_days"] == n
    assert row["n_records"] == n_rec
    assert row["last_record_day"] == last
    assert abs(row["expected"] - E) < 2e-6
    assert abs(row["z"] - (n_rec - E) / np.sqrt(V)) < 2e-6
