"""d_span_corruption / d_readability / q_upsert / d_ann_recall."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_span_corruption_layout_properties(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_span_corruption,
    )

    out = d_span_corruption(SF).to_pandas()
    assert len(out) == 3000
    # every masked doc has n_masked between n_spans (>=1 token per span)
    # and 3*n_spans (merged spans only grow beyond 3 via overlap, which
    # cannot exceed 3 tokens per START; bound still holds per run)
    m = out[out["n_spans"] > 0]
    assert (m["n_masked"] >= m["n_spans"]).all()
    # spans run 3 tokens unless clipped by doc end or merged: the mask
    # fraction stays sane and is the dyadic quotient of the counts
    np.testing.assert_allclose(
        out["mask_frac"],
        np.floor(out["n_masked"] / out["n_tok"] * 1e6 + 0.5005) / 1e6,
        atol=1e-12,
    )
    # expected masking rate ~ 5% starts x ~3 tokens ≈ 13-15%; loose band
    rate = out["n_masked"].sum() / out["n_tok"].sum()
    assert 0.08 < rate < 0.22
    # deterministic: same layout on a second run
    out2 = d_span_corruption(SF).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_readability_hand_computed(ray_session):
    import re

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_readability,
    )

    out = d_readability(SF).to_pandas()
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for _, r in doc.head(40).iterrows():
        t = r["text"] or ""
        w = len(re.findall(r"\S+", t))
        s = sum(1 for x in re.split(r"[.!?]+", t) if re.search(r"\S", x))
        y = len(re.findall(r"[aeiouyAEIOUY]+", t))
        row = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_words"] == w and row["n_sentences"] == s
        assert row["n_syllables"] == y
        if w and s:
            ref = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
            assert abs(row["flesch"] - ref) < 2e-6
        else:
            assert pd.isna(row["flesch"])


def test_upsert_semantics(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_upsert

    out = q_upsert(SF).to_pandas().set_index("o_orderkey")
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).set_index("o_orderkey")
    n_ins = int((orders.index % 9731 == 0).sum())
    assert len(out) == len(orders) + n_ins
    # updated rows take base price + 10, untouched rows pass through
    upd = orders[orders.index % 7 == 0]
    np.testing.assert_allclose(
        out.loc[upd.index, "price"], upd["o_totalprice"] + 10.0
    )
    keep = orders[orders.index % 7 != 0]
    np.testing.assert_allclose(
        out.loc[keep.index, "price"], keep["o_totalprice"]
    )
    # inserts exist at key+100000000 with price 1.0 and is_new
    ins_keys = orders.index[orders.index % 9731 == 0] + 100000000
    assert (out.loc[ins_keys, "price"] == 1.0).all()
    assert out.loc[ins_keys, "is_new"].all()
    assert not out.loc[keep.index, "is_new"].any()


def test_ann_recall_bounds_and_exact_self_recall(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_ann_recall,
    )

    out = d_ann_recall(SF)
    assert len(out) == 8
    assert ((out["recall_at_5"] >= 0) & (out["recall_at_5"] <= 1)).all()
    # each query vector is its own exact nearest neighbor; the IVF probe
    # includes the query's own cluster, so recall is never 0
    assert (out["recall_at_5"] > 0).all()
