"""Truncation waste / share-of-parent vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_truncation_waste_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_truncation_waste,
    )

    out = d_truncation_waste(SF).set_index("ctx_len")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ntok = np.array([len((t or "").split()) for t in docs["text"]],
                    np.int64)
    total = int(ntok.sum())
    for L in (32, 64, 128, 256):
        kept = int(np.minimum(ntok, L).sum())
        assert int(out.loc[L, "n_docs"]) == len(ntok)
        assert int(out.loc[L, "total_tokens"]) == total
        assert int(out.loc[L, "kept_tokens"]) == kept
        assert int(out.loc[L, "docs_truncated"]) == int((ntok > L).sum())
        assert abs(out.loc[L, "kept_frac"] - kept / total) < 5e-6
    # monotone: longer context keeps more
    kf = out["kept_frac"].to_numpy()
    assert (np.diff(kf) >= -1e-9).all() and kf[-1] <= 1.0 + 1e-9


def test_share_of_parent_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_share_of_parent,
    )

    out = q_share_of_parent(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_extendedprice"])
    li = li.assign(rev=np.floor(li["l_extendedprice"].to_numpy() * 100
                                + 0.5).astype(np.int64))
    leaf = li.groupby(["l_returnflag", "l_linestatus"])["rev"].sum()
    parent = li.groupby("l_returnflag")["rev"].sum()
    total = int(li["rev"].sum())
    for _, r in out.iterrows():
        key = (r["l_returnflag"], r["l_linestatus"])
        assert int(r["revenue_cents"]) == int(leaf.loc[key])
        assert int(r["parent_cents"]) == int(parent.loc[key[0]])
        assert abs(r["share_of_parent"]
                   - leaf.loc[key] / parent.loc[key[0]]) < 5e-6
        assert abs(r["share_of_total"] - leaf.loc[key] / total) < 5e-6
    # shares of each parent sum to 1
    for f, g in out.groupby("l_returnflag"):
        assert abs(g["share_of_parent"].sum() - 1.0) < 1e-5
    assert abs(out["share_of_total"].sum() - 1.0) < 1e-5
