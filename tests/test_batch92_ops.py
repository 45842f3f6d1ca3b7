"""Batch 92: TPC-H Q5 local-supplier revenue, exponential KS on
inter-arrival gaps, lognormal length fit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_local_supplier_revenue_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_local_supplier_revenue,
    )

    out = q_local_supplier_revenue(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    re = pd.read_parquet(f"{SF}/region.parquet")
    asia = int(re.loc[re.r_name == "ASIA", "r_regionkey"].iloc[0])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey"))
    j = j[(j["c_nationkey"] == j["s_nationkey"])
          & (j["n_regionkey"] == asia)]
    cents = np.floor(j["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    dbp = np.floor(j["l_discount"].to_numpy() * 100
                   + 0.5).astype(np.int64)
    j = j.assign(rev=[int(c) * (100 - int(d))
                      for c, d in zip(cents, dbp)])
    exp = j.groupby("n_name").agg(
        n_lines=("rev", "size"), rev=("rev", "sum"))
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        assert row["n_lines"] == exp.loc[row["n_name"], "n_lines"]
        assert int(row["rev_units"]) == exp.loc[row["n_name"], "rev"]
    # deterministic (rev desc, name) order
    revs = [int(x) for x in out["rev_units"]]
    assert revs == sorted(revs, reverse=True)


def test_exp_gof_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_exp_gof,
    )

    out = t_exp_gof(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    u = ev["user_id"].to_numpy(np.int64)
    same = u[1:] == u[:-1]
    gaps = (t[1:] - t[:-1])[same] // 1_000_000
    n = len(gaps)
    mu = gaps.sum() / n
    vals, cnt = np.unique(gaps, return_counts=True)
    cum = np.cumsum(cnt)
    d_best = -1
    for i, v in enumerate(vals):
        fm = int(np.floor((1 - np.exp(-v / mu)) * 1e6 + 0.5005))
        pc = int(cum[i - 1]) if i else 0
        d_best = max(d_best, abs(int(cum[i]) * 10**6 - n * fm),
                     abs(pc * 10**6 - n * fm))
    row = out.iloc[0]
    assert row["n_gaps"] == n
    assert abs(row["mean_gap_s"] - mu) < 2e-6
    assert abs(row["ks_d"] - d_best / (n * 1e6)) < 2e-6


def test_length_lognormal_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_length_lognormal,
    )

    out = d_length_lognormal(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    docs = docs[docs["n_chars"] > 0]
    for _, row in out.iterrows():
        L = docs.loc[docs["source"] == row["source"], "n_chars"] \
            .to_numpy(np.int64)
        ln = np.log(L.astype(np.float64))
        assert row["n_docs"] == len(L)
        assert abs(row["mu_ln"] - ln.mean()) < 1e-4
        assert abs(row["sigma_ln"] - ln.std()) < 1e-4
        assert row["median_chars"] == int(
            np.sort(L)[(len(L) + 1) // 2 - 1])
        assert abs(row["lognormal_median"] - np.exp(ln.mean())) < 0.05
