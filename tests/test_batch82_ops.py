"""Batch 82: bounce rate by entry type, order fill latency by month,
nDCG@100."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_bounce_rate_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_bounce_rate,
    )

    out = t_bounce_rate(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="stable")
    sessions = {}
    for _, g in ev.groupby("user_id"):
        t = g["us"].to_numpy()
        et = g["event_type"].to_numpy(object)
        new = np.concatenate([[True], t[1:] - t[:-1] > 1_800_000_000])
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            mask = sid == s
            entry = et[mask][0]
            n = int(mask.sum())
            cell = sessions.setdefault(entry, [0, 0])
            cell[0] += 1
            cell[1] += int(n == 1)
    assert len(out) == len(sessions)
    for _, r in out.iterrows():
        s, b = sessions[r["entry_type"]]
        assert r["n_sessions"] == s and r["n_bounces"] == b
        assert abs(r["bounce_rate"] - b / s) < 2e-6


def test_order_fill_latency_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_fill_latency,
    )

    out = q_order_fill_latency(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    li["d"] = li["l_shipdate"].astype("datetime64[us]").astype(
        np.int64) // 86_400_000_000
    per = li.groupby("l_orderkey")["d"].max()
    od = od[od["o_orderkey"].isin(per.index)].copy()
    od["gap"] = per.reindex(od["o_orderkey"]).to_numpy() \
        - od["o_orderdate"].astype("datetime64[us]").astype(
            np.int64).to_numpy() // 86_400_000_000
    od["ym"] = (od["o_orderdate"].dt.year * 100
                + od["o_orderdate"].dt.month)
    for ym, grp in od.groupby("ym"):
        row = out.loc[out["ym"] == ym].iloc[0]
        v = np.sort(grp["gap"].to_numpy())
        n = len(v)
        assert row["n_orders"] == n
        assert row["median_fill_days"] == v[(n + 1) // 2 - 1]
        assert row["p90_fill_days"] == v[(9 * n + 9) // 10 - 1]
        assert abs(row["mean_fill_days"] - v.mean()) < 2e-6
    assert len(out) == od["ym"].nunique()


def test_ndcg_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_ndcg,
    )

    out = d_ndcg(SF)
    dc = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    rel = np.where(dc["lang"] == "en", 2,
                   np.where(dc["lang"].isin(["es", "de", "fr"]), 1, 0))
    dc = dc.assign(rel=rel).sort_values(
        ["n_chars", "doc_id"], ascending=[False, True])
    K = min(100, len(dc))
    disc = np.floor(1e9 / np.log2(np.arange(1, 101) + 1.0)
                    + 0.5005).astype(np.int64)
    gains = (2 ** dc["rel"].to_numpy()[:K]) - 1
    dcg = int((gains * disc[:K]).sum())
    ig = np.sort((2 ** dc["rel"].to_numpy()) - 1)[::-1][:K]
    idcg = int((ig * disc[: len(ig)]).sum())
    assert int(out["dcg_nano"].iloc[0]) == dcg
    assert int(out["idcg_nano"].iloc[0]) == idcg
    assert abs(out["ndcg"].iloc[0] - dcg / idcg) < 2e-6
