"""Batch 83: centroid silhouette, grouped correlation, funnel trend."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_embed_silhouette_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_silhouette,
    )

    out = d_embed_silhouette(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["label", "embedding"])
    v = np.stack(em["embedding"].to_numpy())
    q = np.floor(v.astype(np.float64) * 1e6 + 0.5)
    lab = em["label"].to_numpy()
    labels = sorted(np.unique(lab))
    cent = np.stack([
        np.floor(q[lab == l].sum(axis=0) / (lab == l).sum() + 0.5)
        for l in labels])
    d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    own = np.searchsorted(labels, lab)
    a2 = d2[np.arange(len(lab)), own]
    d2m = d2.copy()
    d2m[np.arange(len(lab)), own] = np.inf
    b2 = d2m.min(axis=1)
    sa, sb = np.sqrt(a2), np.sqrt(b2)
    mx = np.maximum(sa, sb)
    s = np.where(mx == 0, 0.0, (sb - sa) / np.where(mx == 0, 1, mx))
    m = np.floor(s * 1e6 + 0.5)
    for i, l in enumerate(labels):
        row = out.loc[out["label"] == l].iloc[0]
        sel = m[lab == l]
        assert row["n"] == len(sel)
        assert abs(row["mean_sil"]
                   - sel.sum() / (len(sel) * 1e6)) < 2e-6


def test_grouped_corr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_grouped_corr,
    )

    out = q_grouped_corr(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    li["x"] = li["l_quantity"].astype(np.int64)
    li["y"] = np.floor(li["l_extendedprice"] * 100 + 0.5).astype(
        np.int64)
    for flag, grp in li.groupby("l_returnflag"):
        row = out.loc[out["l_returnflag"] == flag].iloc[0]
        assert row["n"] == len(grp)
        r = np.corrcoef(grp["x"], grp["y"])[0, 1]
        assert abs(row["corr"] - r) < 2e-6
    assert len(out) == li["l_returnflag"].nunique()


def test_funnel_trend_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_funnel_trend,
    )

    out = t_funnel_trend(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    weeks = {}
    for u, g in ev.groupby("user_id"):
        vs = g.loc[g["event_type"] == "view", "us"]
        if not len(vs):
            continue
        fv = vs.min()
        cs = g.loc[(g["event_type"] == "click") & (g["us"] > fv), "us"]
        done = False
        if len(cs):
            fc = cs.min()
            ps = g.loc[(g["event_type"] == "purchase")
                       & (g["us"] > fc), "us"]
            done = bool(len(ps))
        wk = fv // 604_800_000_000
        cell = weeks.setdefault(wk, [0, 0])
        cell[0] += 1
        cell[1] += int(done)
    assert len(out) == len(weeks)
    for _, r in out.iterrows():
        n, c = weeks[r["week"]]
        assert r["n_entered"] == n and r["n_completed"] == c
        assert abs(r["conv_rate"] - c / n) < 2e-6
