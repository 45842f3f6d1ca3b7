"""Batch 99: TPC-H Q13 customer order-count histogram, audience-overlap
Jaccard matrix between event types, two-way ANOVA with interaction."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_custorder_hist_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_custorder_hist,
    )

    out = q_custorder_hist(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey"])
    per = od.groupby("o_custkey").size()
    per = per.reindex(cu["c_custkey"], fill_value=0)
    exp = per.value_counts().sort_index()
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        assert row["n_customers"] == exp[row["order_count"]]
    assert out["n_customers"].sum() == len(cu)


def test_audience_overlap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_audience_overlap,
    )

    out = t_audience_overlap(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    sets = {et: set(g["user_id"]) for et, g in ev.groupby("event_type")}
    types = sorted(sets)
    assert len(out) == len(types) * (len(types) - 1) // 2
    for _, row in out.iterrows():
        a, b = row["type_a"], row["type_b"]
        both = len(sets[a] & sets[b])
        assert row["n_users_a"] == len(sets[a])
        assert row["n_users_b"] == len(sets[b])
        assert row["n_both"] == both
        j = both / len(sets[a] | sets[b])
        assert abs(row["jaccard"] - j) < 2e-6


def test_twoway_anova_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_twoway_anova,
    )

    out = q_twoway_anova(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_discount"])
    li["d"] = np.floor(li["l_discount"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    y = li["d"].to_numpy(np.float64)
    gm = y.mean()
    sst = ((y - gm) ** 2).sum()
    cm = li.groupby(["l_returnflag", "l_linestatus"])["d"] \
        .agg(["mean", "size"])
    ss_cells = (cm["size"] * (cm["mean"] - gm) ** 2).sum()
    am = li.groupby("l_returnflag")["d"].agg(["mean", "size"])
    bm = li.groupby("l_linestatus")["d"].agg(["mean", "size"])
    ssa = (am["size"] * (am["mean"] - gm) ** 2).sum()
    ssb = (bm["size"] * (bm["mean"] - gm) ** 2).sum()
    ssab = ss_cells - ssa - ssb
    sse = sst - ss_cells
    a, b, n = len(am), len(bm), len(li)
    dfe = n - a * b
    row = out.iloc[0]
    assert row["n_lines"] == n
    assert abs(row["ss_flag"] - ssa) < max(1e-3, abs(ssa) * 1e-7)
    assert abs(row["ss_status"] - ssb) < max(1e-3, abs(ssb) * 1e-7)
    assert abs(row["ss_interaction"] - ssab) < max(1e-3,
                                                   abs(ssab) * 1e-6)
    assert abs(row["ss_error"] - sse) < max(1e-3, abs(sse) * 1e-7)
    assert abs(row["f_flag"] - (ssa / (a - 1)) / (sse / dfe)) < 1e-3
    assert abs(row["f_status"] - (ssb / (b - 1)) / (sse / dfe)) < 1e-3
    assert abs(row["f_interaction"]
               - (ssab / ((a - 1) * (b - 1))) / (sse / dfe)) < 1e-3
