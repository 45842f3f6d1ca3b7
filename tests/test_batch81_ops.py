"""Batch 81: small-quantity revenue leak, repeat-revenue split,
label-centroid affinity matrix."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_small_qty_revenue_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_small_qty_revenue,
    )

    out = q_small_qty_revenue(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
    q = li["l_quantity"].to_numpy().astype(np.int64)
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    st = pd.DataFrame({"k": li["l_partkey"], "q": q}).groupby("k")["q"] \
        .agg(["sum", "count"])
    s = st["sum"].reindex(li["l_partkey"]).to_numpy()
    c = st["count"].reindex(li["l_partkey"]).to_numpy()
    small = 5 * q * c < s
    assert out["n_small"].iloc[0] == int(small.sum())
    assert int(out["rev_small_cents"].iloc[0]) == int(cents[small].sum())
    assert abs(out["rev_share"].iloc[0]
               - cents[small].sum() / cents.sum()) < 2e-6


def test_repeat_revenue_split_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_repeat_revenue_split,
    )

    out = q_repeat_revenue_split(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100
                           + 0.5).astype(np.int64)
    per = od.groupby("o_custkey").agg(n=("cents", "size"),
                                      cents=("cents", "sum"))
    rank = np.where(per["n"] == 1, 1, np.where(per["n"] <= 5, 2, 3))
    tot = int(per["cents"].sum())
    for r, grp in per.groupby(rank):
        row = out.loc[out["class_rank"] == r].iloc[0]
        assert row["n_customers"] == len(grp)
        assert row["n_orders"] == int(grp["n"].sum())
        assert int(row["rev_cents"]) == int(grp["cents"].sum())
        assert abs(row["rev_share"] - grp["cents"].sum() / tot) < 2e-6
    assert out["n_orders"].sum() == len(od)


def test_embed_label_affinity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_label_affinity,
    )

    out = d_embed_label_affinity(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["label", "embedding"])
    mats = {}
    for lab, grp in em.groupby("label"):
        v = np.stack(grp["embedding"].to_numpy())
        qv = np.floor(v.astype(np.float64) * 1e6 + 0.5)
        mats[int(lab)] = (qv.sum(axis=0), len(grp))
    labels = sorted(mats)
    n_pairs = 0
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            sa, na_cnt = mats[la]
            sb, nb_cnt = mats[lb]
            cos = float(sa @ sb / np.sqrt((sa @ sa) * (sb @ sb)))
            row = out.loc[(out["label_a"] == la)
                          & (out["label_b"] == lb)].iloc[0]
            assert row["n_a"] == na_cnt and row["n_b"] == nb_cnt
            assert abs(row["cos"] - cos) < 2e-6
            n_pairs += 1
    assert len(out) == n_pairs
