"""Batch 128: type co-movement matrix, duplicate-line audit,
nation coverage audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_type_comovement_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_comovement,
    )

    out = t_type_comovement(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    us = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    ev["h"] = us // 3_600_000_000
    h0, h1 = ev["h"].min(), ev["h"].max()
    span = h1 - h0 + 1
    types = sorted(ev["event_type"].unique())
    grids = {}
    for et in types:
        g = np.zeros(span)
        vc = ev.loc[ev["event_type"] == et, "h"].value_counts()
        g[vc.index.to_numpy() - h0] = vc.to_numpy()
        grids[et] = g
    k = 0
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            row = out.iloc[k]
            assert row["type_a"] == a
            assert row["type_b"] == b
            r = np.corrcoef(grids[a], grids[b])[0, 1]
            assert abs(row["hourly_r"] - r) < 2e-6
            k += 1
    assert k == len(out)


def test_dup_line_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_dup_line_audit,
    )

    out = q_dup_line_audit(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_suppkey"])
    c = li.groupby(["l_orderkey", "l_partkey",
                    "l_suppkey"]).size()
    dup = c[c >= 2]
    row = out.iloc[0]
    assert row["n_lines"] == len(li)
    assert row["n_dup_triples"] == len(dup)
    assert row["n_dup_lines"] == int(dup.sum())
    affected = len({o for o, _, _ in dup.index})
    assert row["n_affected_orders"] == affected
    assert abs(row["dup_line_share"]
               - int(dup.sum()) / len(li)) < 2e-6


def test_nation_coverage_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_nation_coverage_audit,
    )

    out = q_nation_coverage_audit(SF)
    na = pd.read_parquet(f"{SF}/nation.parquet")
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_nationkey"])
    cg = cu["c_nationkey"].value_counts()
    sg = su["s_nationkey"].value_counts()
    na = na.sort_values("n_name")
    assert list(out["n_name"]) == list(na["n_name"])
    for _, row in out.iterrows():
        nk = int(na.loc[na["n_name"] == row["n_name"],
                        "n_nationkey"].iloc[0])
        c = int(cg.get(nk, 0))
        s = int(sg.get(nk, 0))
        assert row["n_customers"] == c
        assert row["n_suppliers"] == s
        assert row["uncovered"] == int(c == 0 and s == 0)
