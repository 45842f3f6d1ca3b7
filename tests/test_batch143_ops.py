"""Batch 143: value drift, brand key-account dependency,
per-dimension tail census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_value_drift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_value_drift,
    )

    out = t_value_drift(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    t = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    mid = (t.min() + t.max()) // 2
    c = np.floor(ev["value"] * 100 + 0.5).astype(int).to_numpy()
    a = c[t <= mid].astype(float)
    b = c[t > mid].astype(float)
    tt = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    row = out.iloc[0]
    assert row["n_first_half"] == len(a)
    assert row["n_second_half"] == len(b)
    assert abs(row["mean_first_cents"] - a.mean()) < 2e-6
    assert abs(row["welch_t"] - tt) < 2e-5


def test_brand_customer_dependency(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_customer_dependency,
    )

    out = q_brand_customer_dependency(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(pt, left_on="l_partkey", right_on="p_partkey"))
    j["rev"] = (np.floor(j["l_extendedprice"] * 100
                         + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    a = j.groupby(["p_brand", "o_custkey"])["rev"].sum()
    per = a.groupby("p_brand").agg(["max", "sum"])
    assert len(out) == len(per)
    for _, row in out.iterrows():
        e = per.loc[row["brand"]]
        assert row["top_customer_units"] == str(int(e["max"]))
        assert row["brand_units"] == str(int(e["sum"]))
        assert abs(row["dependency_share"]
                   - e["max"] / e["sum"]) < 2e-6
    sh = out["dependency_share"].to_numpy()
    assert (sh[:-1] >= sh[1:]).all()


def test_embed_dim_tails(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_dim_tails,
    )

    out = d_embed_dim_tails(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(emb * 1e3 + 0.5)
    exks = []
    for d in range(q.shape[1]):
        x = q[:, d]
        mu = x.mean()
        m2 = ((x - mu) ** 2).sum()
        m4 = ((x - mu) ** 4).sum()
        exks.append(len(x) * m4 / m2 ** 2 - 3.0)
    exks = np.array(exks)
    row = out.iloc[0]
    assert row["n_dims"] == q.shape[1]
    assert row["n_heavy_dims"] == (exks > 1.0).sum()
    best = np.lexsort((np.arange(len(exks)), -exks))[0]
    assert row["spikiest_dim"] == best
    assert abs(row["max_excess_kurtosis"] - exks[best]) < 1e-4
