"""Batch 93: open-order backlog curve, per-source unigram drift,
joint decile census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_open_orders_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_open_orders_curve,
    )

    out = q_open_orders_curve(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    last = li.groupby("l_orderkey")["l_shipdate"].max()
    j = od[od["o_orderkey"].isin(last.index)].copy()
    j["m0"] = (j["o_orderdate"].dt.year * 12
               + j["o_orderdate"].dt.month - 1)
    ls = last.loc[j["o_orderkey"]]
    j["m1"] = (ls.dt.year * 12 + ls.dt.month - 1).to_numpy()
    lo = od["o_orderdate"].dt.year.min() * 12 \
        + od.loc[od["o_orderdate"].dt.year
                 == od["o_orderdate"].dt.year.min(),
                 "o_orderdate"].dt.month.min() - 1
    # brute force: for each grid month, count orders with m0<=m<m1
    mall = od["o_orderdate"].dt.year * 12 + od["o_orderdate"].dt.month - 1
    lo, hi = int(mall.min()), int(mall.max())
    assert len(out) == hi - lo + 1
    for i, m in enumerate(range(lo, hi + 1)):
        exp = int(((j["m0"] <= m) & (m < j["m1"])).sum())
        assert out.iloc[i]["open_orders"] == exp
        assert out.iloc[i]["month"] == (m // 12) * 100 + m % 12 + 1


def test_source_unigram_drift_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_source_unigram_drift,
    )

    out = d_source_unigram_drift(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    dmax = int(docs["doc_id"].max())
    from collections import Counter

    for _, row in out.iterrows():
        sub = docs[docs["source"] == row["source"]]
        a, b = Counter(), Counter()
        for _, r in sub.iterrows():
            tgt = b if 2 * r["doc_id"] > dmax else a
            tgt.update((r["text"] or "").split())
        na, nb = sum(a.values()), sum(b.values())
        assert row["n_tok_first"] == na
        assert row["n_tok_second"] == nb
        jsd = 0.0
        for tok in set(a) | set(b):
            p = a.get(tok, 0) / na
            c = b.get(tok, 0) / nb
            m = 0.5 * (p + c)
            if p > 0:
                jsd += 0.5 * p * np.log(p / m)
            if c > 0:
                jsd += 0.5 * c * np.log(c / m)
        assert abs(row["jsd_drift"] - jsd) < 1e-4


def test_joint_deciles_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_joint_deciles,
    )

    out = q_joint_deciles(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    q = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    p = np.floor(li["l_extendedprice"].to_numpy() * 100
                 + 0.5).astype(np.int64)
    n = len(q)

    def cuts(x):
        xs = np.sort(x)
        return np.array([xs[(k * n + 9) // 10 - 1]
                         for k in range(1, 10)])

    qc, pc = cuts(q), cuts(p)
    dq = np.searchsorted(qc, q, side="left")
    dp = np.searchsorted(pc, p, side="left")
    cell = pd.DataFrame({"q_decile": dq, "p_decile": dp}) \
        .groupby(["q_decile", "p_decile"]).size()
    assert len(out) == len(cell)
    rowt = pd.Series(dq).value_counts()
    colt = pd.Series(dp).value_counts()
    for _, r in out.iterrows():
        exp_n = int(cell.loc[(r["q_decile"], r["p_decile"])])
        assert r["n"] == exp_n
        lift = exp_n * n / (int(rowt[r["q_decile"]])
                            * int(colt[r["p_decile"]]))
        assert abs(r["lift"] - lift) < 2e-6
    assert int(out["n"].sum()) == n
