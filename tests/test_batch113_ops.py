"""Batch 113: cosine background census, tenure activity curve,
revenue mix by part size."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_embed_sim_background_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_sim_background,
    )

    out = d_embed_sim_background(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    ids = em["vec_id"].to_numpy(np.int64)
    nrm = np.linalg.norm(emb, axis=1)
    qidx = np.where(ids < 64)[0]
    sims = (emb / nrm[:, None]) @ (emb[qidx] / nrm[qidx][:, None]).T
    notself = ids[:, None] != ids[qidx][None, :]
    s = sims[notself]
    bins = np.minimum(19, ((np.floor(s * 1e6 + 0.5005)
                            + 1_000_000) // 100_000)).astype(int)
    exp = pd.Series(bins).value_counts().sort_index()
    assert list(out["bin"]) == list(exp.index)
    for _, row in out.iterrows():
        assert row["n_pairs"] == exp.loc[int(row["bin"])]
    assert abs(out.iloc[0]["mean_similarity"] - s.mean()) < 2e-6


def test_tenure_activity_curve_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_tenure_activity_curve,
    )

    out = t_tenure_activity_curve(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    first = ev.groupby("user_id")["d"].transform("min")
    ev["k"] = (ev["d"] - first) // 7
    ev = ev[(ev["k"] >= 0) & (ev["k"] <= 8)]
    g = ev.groupby("k").agg(events=("d", "size"),
                            users=("user_id", "nunique"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["tenure_week"]]
        assert row["n_active_users"] == e["users"]
        assert row["n_events"] == e["events"]
        assert abs(row["events_per_user"]
                   - e["events"] / e["users"]) < 2e-6


def test_size_revenue_mix_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_size_revenue_mix,
    )

    out = q_size_revenue_mix(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_size"])
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    j["rev"] = (np.floor(j["l_extendedprice"] * 100
                         + 0.5).astype(int)
                * (100 - np.floor(j["l_discount"] * 100
                                  + 0.5).astype(int)))
    g = j.groupby("p_size").agg(n=("rev", "size"),
                                rev=("rev", "sum"))
    tot = g["rev"].sum()
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["size"]]
        assert row["n_lines"] == e["n"]
        assert row["rev_units"] == str(int(e["rev"]))
        assert abs(row["rev_share"] - e["rev"] / tot) < 2e-6
