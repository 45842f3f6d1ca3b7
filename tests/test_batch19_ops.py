"""KMV set ops / grouped OLS / seasonal-naive MASE / class balance vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kmv_setops_envelope(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_kmv_setops

    out = d_kmv_setops(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity"])
    a = set(li.loc[li["l_quantity"] >= 25, "l_partkey"])
    b = set(li.loc[li["l_quantity"] < 25, "l_partkey"])
    # KMV with k=256: relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    for col, exact in (("est_a", len(a)), ("est_b", len(b)),
                       ("est_union", len(a | b)), ("est_inter", len(a & b))):
        assert abs(out[col] - exact) <= max(0.30 * exact, 16), (col, out[col], exact)
    # sketch invariants
    assert out["kk_union"] <= out["kk_a"] + out["kk_b"]
    assert 0 <= out["inter_in_k"] <= out["kk_union"]
    assert out["est_inter"] <= out["est_union"] + 1e-6


def test_grouped_ols_matches_lstsq(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_grouped_ols

    out = q_grouped_ols(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    h0 = int(us.min() // 3_600_000_000)
    ev = ev.assign(x=(us // 3_600_000_000 - h0),
                   y=np.floor(ev["value"].to_numpy() * 100 + 0.5))
    for et, g in ev.groupby("event_type"):
        x, y = g["x"].to_numpy(np.float64), g["y"].to_numpy(np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert int(out.loc[et, "n"]) == len(g)
        assert abs(out.loc[et, "slope"] - slope) < 1e-4
        assert abs(out.loc[et, "intercept"] - intercept) < 1e-2
        assert abs(out.loc[et, "r2"] - r * r) < 1e-4
        assert 0.0 <= out.loc[et, "r2"] <= 1.0 + 1e-9


def test_forecast_error_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_forecast_error,
    )

    out = t_forecast_error(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    for et in ev["event_type"].unique():
        y = np.bincount(h[ev["event_type"].to_numpy() == et] - lo,
                        minlength=H).astype(np.int64)
        sae24 = int(np.abs(y[24:] - y[:-24]).sum())
        sae1 = int(np.abs(y[1:] - y[:-1]).sum())
        assert int(out.loc[et, "n_hours"]) == H
        assert int(out.loc[et, "sae_seasonal"]) == sae24
        assert int(out.loc[et, "sae_naive"]) == sae1
        if sae1:
            mase = (sae24 / (H - 24)) / (sae1 / (H - 1))
            assert abs(out.loc[et, "mase"] - mase) < 5e-6


def test_class_balance_exact_counts_and_pick(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_class_balance,
    )

    out = d_class_balance(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    n_min = int(docs["lang"].value_counts().min())
    sizes = out.groupby("lang").size()
    assert (sizes == n_min).all() and set(sizes.index) == set(docs["lang"])
    # the picked rows are exactly the n_min smallest Fibonacci-hash keys
    key = (docs["doc_id"].to_numpy(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)
    docs = docs.assign(key=key.astype(np.int64))
    for lang, g in docs.groupby("lang"):
        exp = set(g.sort_values("key")["doc_id"].head(n_min))
        assert set(out.loc[out["lang"] == lang, "doc_id"]) == exp
