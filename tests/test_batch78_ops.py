"""Batch 78: order status aging, header-line status consistency,
boilerplate sentence positions."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_order_status_age_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_status_age,
    )

    out = q_order_status_age(SF).set_index("status")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderstatus", "o_orderdate"])
    d = (od["o_orderdate"].astype("datetime64[us]").astype(np.int64)
         // 86_400_000_000)
    dmax = int(d.max())
    N = len(od)
    for st, g in od.groupby("o_orderstatus"):
        r = out.loc[st]
        assert r["n_orders"] == len(g)
        assert abs(r["share"] - len(g) / N) < 2e-6
        if st == "O":
            age = np.sort(dmax - d[g.index].to_numpy())
            n = len(age)
            assert r["median_age_days"] == age[(n + 1) // 2 - 1]
            assert r["p90_age_days"] == age[(9 * n + 9) // 10 - 1]
            assert abs(r["mean_age_days"] - age.mean()) < 2e-6
        else:
            assert r["median_age_days"] == -1
            assert r["mean_age_days"] == -1.0


def test_status_consistency_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_status_consistency,
    )

    out = q_status_consistency(SF).set_index("status")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linestatus"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderstatus"])
    per = li.groupby("l_orderkey")["l_linestatus"].agg(
        n="size", nf=lambda s: (s == "F").sum())
    j = per.join(od.set_index("o_orderkey"), how="inner")
    j["uni"] = (j["nf"] == 0) | (j["nf"] == j["n"])
    j["match"] = j["uni"] & (
        ((j["nf"] == j["n"]) & (j["o_orderstatus"] == "F"))
        | ((j["nf"] == 0) & (j["o_orderstatus"] == "O")))
    for st, g in j.groupby("o_orderstatus"):
        r = out.loc[st]
        assert r["n_orders"] == len(g)
        assert r["uniform_lines"] == int(g["uni"].sum())
        assert r["mixed_lines"] == len(g) - int(g["uni"].sum())
        assert r["lines_match_header"] == int(g["match"].sum())
        assert abs(r["uniform_share"] - g["uni"].mean()) < 2e-6
    # 'P' headers can never match
    if "P" in out.index:
        assert out.loc["P", "lines_match_header"] == 0


def test_sentence_positions_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_sentence_positions,
    )

    out = d_sentence_positions(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter, defaultdict
    occ = defaultdict(list)
    HDR = "The following text is machine generated."
    FTR = "This document is provided as is without warranty."
    for did, t in zip(docs["doc_id"], docs["text"]):
        t = t or ""
        if did % 11 == 0:
            t = HDR + " " + t
        if did % 7 == 0:
            t = t + " " + FTR
        sents = [x.strip(" ") for x in t.split(".")]
        sents = [x for x in sents if len(x.split()) >= 3]
        ns = len(sents)
        for i, x in enumerate(sents):
            occ[x].append(i * 3 // ns)
    rep = {s: ts for s, ts in occ.items() if len(ts) >= 2}
    total = sum(len(ts) for ts in rep.values())
    by_t = Counter(t for ts in rep.values() for t in ts)
    assert out["repeated_sentences"].iloc[0] == len(rep)
    assert out["occurrences"].iloc[0] == total
    assert abs(out["first_share"].iloc[0] - by_t[0] / total) < 2e-6
    assert abs(out["middle_share"].iloc[0] - by_t[1] / total) < 2e-6
    assert abs(out["last_share"].iloc[0] - by_t[2] / total) < 2e-6
    assert abs(out[["first_share", "middle_share", "last_share"]]
               .iloc[0].sum() - 1.0) < 1e-4
