"""Batch 138: event value concentration, length drift across
halves, SKU repurchase cycle."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_value_concentration(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_value_concentration,
    )

    out = t_value_concentration(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["value"])
    c = np.sort(np.floor(ev["value"] * 100 + 0.5)
                .astype(int))[::-1]
    n = len(c)
    k = int(np.ceil(0.01 * n))
    row = out.iloc[0]
    assert row["n_events"] == n
    assert row["n_top"] == k
    assert abs(row["top1pct_value_share"]
               - c[:k].sum() / c.sum()) < 2e-6


def test_length_drift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_length_drift,
    )

    out = d_length_drift(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    dmax = docs["doc_id"].max()
    a = docs.loc[2 * docs["doc_id"] <= dmax, "n_chars"] \
        .to_numpy(float)
    b = docs.loc[2 * docs["doc_id"] > dmax, "n_chars"] \
        .to_numpy(float)
    t = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    row = out.iloc[0]
    assert row["n_first_half"] == len(a)
    assert row["n_second_half"] == len(b)
    assert abs(row["mean_len_first"] - a.mean()) < 2e-6
    assert abs(row["mean_len_second"] - b.mean()) < 2e-6
    assert abs(row["welch_t"] - t) < 2e-5


def test_sku_repurchase_cycle(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_sku_repurchase_cycle,
    )

    out = q_sku_repurchase_cycle(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    j["d"] = j["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    b = j[["o_custkey", "l_partkey", "d"]].drop_duplicates() \
        .sort_values(["o_custkey", "l_partkey", "d"])
    u = b["o_custkey"].to_numpy()
    p = b["l_partkey"].to_numpy()
    d = b["d"].to_numpy()
    same = (u[1:] == u[:-1]) & (p[1:] == p[:-1])
    gaps = np.sort((d[1:] - d[:-1])[same])
    n = len(gaps)
    row = out.iloc[0]
    assert row["n_repeat_pairs"] == n
    assert row["median_cycle_days"] == gaps[(n + 1) // 2 - 1]
    assert row["p90_cycle_days"] == gaps[int(np.ceil(0.9 * n)) - 1]
