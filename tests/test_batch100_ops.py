"""Batch 100: supply-resilience census, per-source Zipf slope,
minute-grain peak concurrency."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_supply_resilience_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_supply_resilience,
    )

    out = q_supply_resilience(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
    k = j.groupby("l_partkey")["s_nationkey"].nunique()
    c = np.floor(li["l_extendedprice"].to_numpy() * 100
                 + 0.5).astype(np.int64)
    d = np.floor(li["l_discount"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    li["rev"] = c * (100 - d)
    rev_p = li.groupby("l_partkey")["rev"].sum()
    buck = pd.DataFrame({"k": k, "rev": rev_p}).groupby("k").agg(
        n_parts=("rev", "size"), rev=("rev", "sum"))
    total = int(buck["rev"].sum())
    assert len(out) == len(buck)
    for _, row in out.iterrows():
        e = buck.loc[row["n_nations"]]
        assert row["n_parts"] == e["n_parts"]
        assert int(row["revenue_units"]) == int(e["rev"])
        assert abs(row["revenue_share"] - int(e["rev"]) / total) < 2e-6


def test_zipf_slope_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_zipf_slope,
    )

    out = d_zipf_slope(SF)
    dc = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["source", "text"])
    for _, row in out.iterrows():
        src = row["source"]
        toks = dc.loc[dc["source"] == src, "text"].fillna("") \
            .str.findall(r"\S+").explode().dropna()
        vc = toks.value_counts()
        vc = vc.reset_index()
        vc.columns = ["token", "n"]
        vc = vc.sort_values(["n", "token"],
                            ascending=[False, True],
                            kind="stable").head(100)
        r = len(vc)
        x = np.log(np.arange(1, r + 1))
        y = np.log(vc["n"].to_numpy(np.float64))
        slope = np.polyfit(x, y, 1)[0]
        rr = np.corrcoef(x, y)[0, 1] ** 2
        assert row["n_ranks"] == r
        assert abs(row["zipf_slope"] - slope) < 1e-4
        assert abs(row["r2"] - rr) < 1e-4


def test_peak_concurrency_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_peak_concurrency,
    )

    out = t_peak_concurrency(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    m = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 60_000_000
    per = pd.DataFrame({"m": m, "u": ev["user_id"]}) \
        .drop_duplicates().groupby("m").size()
    row = out.iloc[0]
    peak = int(per.max())
    assert row["peak_users"] == peak
    assert row["peak_minute"] == int(per[per == peak].index.min())
    assert row["n_active_minutes"] == len(per)
    assert abs(row["mean_concurrency"] - per.mean()) < 2e-6
