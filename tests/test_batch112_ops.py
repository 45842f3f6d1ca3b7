"""Batch 112: simhash Hamming background census, order value by
basket breadth, demand-spike revenue exposure."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_simhash_hamming_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_simhash_hamming,
    )
    from complexity_driven_feature_construction_ray.stages.sketch import (
        simhash_replayable,
    )
    import ray

    out = d_simhash_hamming(SF)
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    sig = simhash_replayable(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pid = sig[sig["doc_id"] < 64]
    from collections import Counter
    hist = Counter()
    for _, p in pid.iterrows():
        for _, d in sig.iterrows():
            if d["doc_id"] == p["doc_id"]:
                continue
            hist_k = bin(int(d["simhash"]) ^ int(p["simhash"])) \
                .count("1")
            hist[hist_k] += 1
    dists = sorted(hist)
    assert list(out["dist"]) == dists
    for _, row in out.iterrows():
        assert row["n_pairs"] == hist[int(row["dist"])]
    n = sum(hist.values())
    cum = 0
    for d in dists:
        cum += hist[d]
        if cum >= (n + 1) // 2:
            med = d
            break
    assert (out["median_distance"] == med).all()


def test_order_value_by_linecount_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_value_by_linecount,
    )

    out = q_order_value_by_linecount(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    lc = li.groupby("l_orderkey").size().rename("lines")
    od = od.join(lc, on="o_orderkey", how="inner")
    od["cents"] = np.floor(od["o_totalprice"] * 100
                           + 0.5).astype(int)
    g = od.groupby("lines").agg(n=("cents", "size"),
                                s=("cents", "sum"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["n_lines"]]
        assert row["n_orders"] == e["n"]
        assert abs(row["mean_order_cents"] - e["s"] / e["n"]) < 2e-6
        assert abs(row["mean_cents_per_line"]
                   - e["s"] / e["n"] / row["n_lines"]) < 2e-6


def test_spike_value_share_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_spike_value_share,
    )

    out = t_spike_value_share(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    ev["h"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 3_600_000_000
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("h").agg(n=("cents", "size"),
                            c=("cents", "sum")).reset_index()
    nh = len(g)
    k = int(np.ceil(0.01 * nh))
    g = g.sort_values(["n", "h"], ascending=[False, True])
    row = out.iloc[0]
    assert row["n_hours"] == nh
    assert row["n_spike_hours"] == k
    assert abs(row["spike_event_share"]
               - g["n"].head(k).sum() / g["n"].sum()) < 2e-6
    assert abs(row["spike_value_share"]
               - g["c"].head(k).sum() / g["c"].sum()) < 2e-6
