"""Batch 87: kNN label purity, cohort repurchase rate, attribution
model-agreement census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_knn_purity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_knn_purity,
    )

    out = d_knn_purity(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    probes = np.where(ids < 32)[0]
    assert len(out) == len(probes)
    for qi in probes:
        sims = mat @ mat[qi]
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-sims[i], ids[i]))
        nn = order[:5]
        same = sum(1 for i in nn if labs[i] == labs[qi])
        row = out[out["query_id"] == ids[qi]].iloc[0]
        assert row["label"] == labs[qi]
        assert row["n_same"] == same
        assert abs(row["purity"] - same / 5) < 2e-6


def test_repurchase_rate_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_repurchase_rate,
    )

    out = q_repurchase_rate(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["d"] = od["o_orderdate"].astype("datetime64[us]").astype(
        np.int64) // 86_400_000_000
    agg = {}
    for ck, grp in od.groupby("o_custkey"):
        ds = np.sort(grp["d"].to_numpy(np.int64))
        first = pd.to_datetime(ds[0], unit="D")
        cohort = first.year * 100 + first.month
        rep = len(ds) >= 2 and ds[1] - ds[0] <= 90
        n, r = agg.get(cohort, (0, 0))
        agg[cohort] = (n + 1, r + int(rep))
    assert len(out) == len(agg)
    for _, row in out.iterrows():
        n, r = agg[row["cohort_month"]]
        assert (row["n_customers"], row["n_repeat_90d"]) == (n, r)
        assert abs(row["repurchase_rate"] - r / n) < 2e-6
    assert out["n_repeat_90d"].sum() > 0  # non-trivial fixture


def test_attribution_compare_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_attribution_compare,
    )

    out = t_attribution_compare(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["t"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    LB = 7 * 86_400_000_000
    n_p = n_att = n_single = n_multi = tot = 0
    for _, grp in ev.groupby("user_id"):
        p = grp[grp["event_type"] == "purchase"]
        c = grp[grp["event_type"] == "click"]
        for _, pr in p.iterrows():
            n_p += 1
            k = 0
            for _, cl in c.iterrows():
                before = (cl["t"], cl["event_id"]) < (pr["t"],
                                                      pr["event_id"])
                if before and cl["t"] >= pr["t"] - LB:
                    k += 1
            if k >= 1:
                n_att += 1
                tot += k
                n_single += int(k == 1)
                n_multi += int(k >= 2)
    row = out.iloc[0]
    assert (row["n_purchases"], row["n_attributed"]) == (n_p, n_att)
    assert (row["n_single_click"], row["n_multi_click"]) == (n_single,
                                                             n_multi)
    assert abs(row["attributed_rate"] - n_att / n_p) < 2e-6
    assert abs(row["agree_share"] - n_single / n_att) < 2e-6
    assert abs(row["mean_path_clicks"] - tot / n_att) < 2e-6
    assert n_multi > 0  # the models genuinely diverge on the fixture
