"""Waterfill budget allocation / FK audit / ECE vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _waterfill_ref(cap, w, B):
    """Reference: iterate Page-style — saturate cheapest ratios first."""
    cap, w = cap.astype(float), w.astype(float)
    order = np.argsort(cap / w, kind="stable")
    sat = np.zeros(len(cap), bool)
    for _ in range(len(cap) + 1):
        rest = ~sat
        lam = (B - cap[sat].sum()) / w[rest].sum() if rest.any() else 0.0
        newly = rest & (cap <= w * lam + 1e-9)
        if not newly.any():
            break
        sat |= newly
    return sat, lam


def test_budget_alloc_invariants(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_budget_alloc

    out = d_budget_alloc(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    caps = docs.groupby("source")["n_chars"].sum().sort_index()
    B = int(caps.sum()) * 8 // 10
    assert np.array_equal(out.sort_values("source")["cap"].to_numpy(),
                          caps.to_numpy())
    # allocation exhausts the budget (up to 6dp quantization per source)
    assert abs(out["alloc"].sum() - B) < 1e-4 * len(out)
    # never exceeds capacity; saturated rows get exactly their cap
    assert (out["alloc"] <= out["cap"] + 1e-9).all()
    sat = out["saturated"].to_numpy()
    assert np.allclose(out.loc[sat, "alloc"], out.loc[sat, "cap"])
    # unsaturated allocs are proportional to weight (shared λ)
    uns = out[~out["saturated"]]
    if len(uns) >= 2:
        lam = uns["alloc"].to_numpy() / uns["w"].to_numpy()
        assert np.allclose(lam, lam[0], atol=1e-5)
    # matches the independent iterative reference
    ref_sat, ref_lam = _waterfill_ref(
        caps.to_numpy(np.int64), np.arange(1, len(caps) + 1), B)
    assert np.array_equal(out.sort_values("source")["saturated"].to_numpy(),
                          ref_sat)


def test_fk_audit_matches_pandas(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_fk_audit

    out = q_fk_audit(SF).set_index("check_name")["n"]
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    assert int(out["lineitem_orphans"]) == \
        int((~li["l_orderkey"].isin(orders["o_orderkey"])).sum())
    assert int(out["orders_childless"]) == \
        int((~orders["o_orderkey"].isin(li["l_orderkey"])).sum())
    assert int(out["orders_orphans"]) == \
        int((~orders["o_custkey"].isin(cust["c_custkey"])).sum())
    assert int(out["customers_inactive"]) == \
        int((~cust["c_custkey"].isin(orders["o_custkey"])).sum())


def test_ece_matches_calibration_bins(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_calibration,
        d_ece,
    )

    bins = d_calibration(SF)
    out = d_ece(SF)
    n = bins["n"].to_numpy(np.float64)
    gap = np.abs(bins["mean_label"].to_numpy() - bins["mean_score"].to_numpy())
    ref = float((n * gap).sum() / n.sum())
    assert int(out["n"].iloc[0]) == int(n.sum())
    assert int(out["n_bins"].iloc[0]) == len(bins)
    assert abs(out["ece"].iloc[0] - ref) < 5e-6
    assert 0.0 <= out["ece"].iloc[0] <= 1.0
