"""Dup-cluster histogram vs brute force; grouped IQR vs numpy."""

import numpy as np
import pandas as pd


def test_dup_cluster_sizes_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_dup_cluster_sizes,
    )

    out = d_dup_cluster_sizes("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    rep = np.where(docs["doc_id"] % 21 == 0, 3,
                   np.where(docs["doc_id"] % 7 == 0, 2, 1))
    all_txt = docs["text"].to_numpy(dtype=object).repeat(rep)
    sizes = pd.Series(all_txt).value_counts()
    exp = sizes.value_counts().sort_index()
    assert out.set_index("size")["n_clusters"].to_dict() == exp.to_dict()
    # injection produced multi-member clusters
    assert (out["size"] >= 2).any()


def test_grouped_iqr_matches_numpy_disc(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_grouped_iqr

    out = q_grouped_iqr("/root/testdata/sf0.001").set_index("l_returnflag")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    for flag, g in li.groupby("l_returnflag"):
        v = np.sort(g["l_extendedprice"].to_numpy())
        # percentile_disc: smallest value at cumulative rank >= q*N
        p25 = v[int(np.ceil(0.25 * len(v))) - 1]
        p75 = v[int(np.ceil(0.75 * len(v))) - 1]
        assert out.loc[flag, "p25"] == p25
        assert out.loc[flag, "p75"] == p75
        assert out.loc[flag, "iqr"] == p75 - p25


def test_embed_quantize_error_bounds(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_embed_quantize

    out = d_embed_quantize("/root/testdata/sf0.001")
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["embedding"])
    M = np.stack(emb["embedding"].to_numpy())
    span = M.max(axis=0) - M.min(axis=0)
    # max per-element error is span/510 (half a quantization step)
    bound = float(np.mean((span / 510.0) ** 2))
    assert (out["mse"] >= 0).all()
    assert (out["mse"] <= bound + 1e-12).all()
    assert out["mse"].max() > 0


def test_woe_sign_and_reference(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_woe

    out = fe_woe("/root/testdata/sf0.001")
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                             columns=["o_orderpriority", "o_orderstatus"])
    for _, r in out.iterrows():
        g = orders[orders.o_orderpriority == r.o_orderpriority]
        pos = int((g.o_orderstatus == "F").sum())
        neg = len(g) - pos
        assert r.pos == pos and r.neg == neg
        pt = int((orders.o_orderstatus == "F").sum())
        nt = len(orders) - pt
        exp = np.log(((pos + 0.5) / pt) / ((neg + 0.5) / nt))
        assert abs(r.woe - exp) < 2e-6
