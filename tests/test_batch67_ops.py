"""Batch 67: periodogram, user lifetime, embedding label purity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_periodogram_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_periodogram,
    )

    out = t_periodogram(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    us = ev["ts"].astype("datetime64[us]").astype(np.int64)
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    h = us // 3_600_000_000
    hourly = pd.Series(cents).groupby(h.to_numpy()).sum()
    h0, h1 = int(hourly.index.min()), int(hourly.index.max())
    grid = np.zeros(h1 - h0 + 1, dtype=np.int64)
    grid[hourly.index.to_numpy() - h0] = hourly.to_numpy()
    powers = {}
    for p in [6, 12, 24, 168]:
        m = (len(grid) // p) * p
        x = grid[:m].astype(float)
        k = np.arange(m) % p
        cq = np.floor(np.cos(2 * np.pi * np.arange(p) / p) * 1e6
                      + 0.5005)
        sq = np.floor(np.sin(2 * np.pi * np.arange(p) / p) * 1e6
                      + 0.5005)
        a = (x * cq[k]).sum()
        b = (x * sq[k]).sum()
        powers[p] = a * a + b * b
    tot = sum(powers.values())
    got = out.set_index("period_hours")
    for p in [6, 12, 24, 168]:
        assert abs(got.loc[p, "power_share"] - powers[p] / tot) < 1e-5
    ref_top = min(p for p in powers if powers[p] == max(powers.values()))
    assert (out["top_period"] == ref_top).all()
    assert abs(out["power_share"].sum() - 1.0) < 1e-4


def test_user_lifetime_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_user_lifetime,
    )

    out = t_user_lifetime(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
    per = ev.groupby("user_id")["d"].agg(["min", "max"])
    life = np.sort((per["max"] - per["min"]).to_numpy(np.int64))
    n = len(life)
    assert out["n_users"].iloc[0] == n
    assert out["median_lifetime_days"].iloc[0] == life[(n + 1) // 2 - 1]
    assert out["p90_lifetime_days"].iloc[0] == life[(9 * n + 9) // 10 - 1]
    assert out["one_day_users"].iloc[0] == int((life == 0).sum())
    assert abs(out["mean_lifetime_days"].iloc[0] - life.mean()) < 2e-6


def test_embed_label_purity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_label_purity,
    )

    out = d_embed_label_purity(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["embedding", "label"])
    m = np.vstack(em["embedding"].to_numpy())
    bucket = ((m[:, :8] > 0).astype(int)
              * (1 << np.arange(8))).sum(axis=1)
    from collections import Counter, defaultdict
    cells = defaultdict(Counter)
    for b, lab in zip(bucket, em["label"]):
        cells[int(b)][int(lab)] += 1
    got = out.set_index("bucket")
    assert len(got) == len(cells)
    maj_total = 0
    for b, cnt in cells.items():
        nb = sum(cnt.values())
        maj_lab = min(k for k in cnt if cnt[k] == max(cnt.values()))
        maj = cnt[maj_lab]
        maj_total += maj
        assert got.loc[b, "n"] == nb
        assert got.loc[b, "majority_label"] == maj_lab
        assert abs(got.loc[b, "purity"] - maj / nb) < 2e-6
    assert abs(out["overall_purity"].iloc[0]
               - maj_total / len(em)) < 2e-6
