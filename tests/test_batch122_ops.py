"""Batch 122: numeric-token doc profile, whitespace hygiene audit,
order supplier fan-out."""

import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_numeric_doc_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_numeric_doc_profile,
    )

    out = d_numeric_doc_profile(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    pat = re.compile(r"^\d+([.,]\d+)?$")
    buckets = np.zeros(10, np.int64)
    shares = []
    for t in docs["text"].fillna(""):
        ws = t.split()
        if not ws:
            continue
        h = sum(1 for w in ws if pat.match(w))
        buckets[min(9, (10 * h) // len(ws))] += 1
        shares.append(h / len(ws))
    exp = {b: int(f) for b, f in enumerate(buckets) if f > 0}
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        assert row["n_docs"] == exp[int(row["bucket"])]
    assert abs(out.iloc[0]["mean_numeric_share"]
               - np.mean(shares)) < 2e-6


def test_whitespace_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_whitespace_audit,
    )

    out = d_whitespace_audit(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    s = docs["text"].fillna("")
    n = len(s)
    d = int(s.str.contains("  ", regex=False).sum())
    le = int(s.str.match(r"^\s").sum())
    tr = int(s.str.contains(r"\s$").sum())
    row = out.iloc[0]
    assert row["n_docs"] == n
    assert row["n_double_space"] == d
    assert row["n_leading_ws"] == le
    assert row["n_trailing_ws"] == tr
    assert abs(row["double_space_share"] - d / n) < 2e-6


def test_order_supplier_spread_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_supplier_spread,
    )

    out = q_order_supplier_spread(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    k = li.drop_duplicates().groupby("l_orderkey").size()
    h = k.value_counts().sort_index()
    n = int(h.sum())
    assert list(out["n_suppliers"]) == list(h.index)
    for _, row in out.iterrows():
        assert row["n_orders"] == h[int(row["n_suppliers"])]
    single = int(h.get(1, 0))
    assert abs(out.iloc[0]["single_supplier_share"]
               - single / n) < 2e-6
