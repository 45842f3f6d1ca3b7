"""Batch 157: fleet cadence trend, per-type value drift,
vocabulary front-loading."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cadence_trend(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_cadence_trend,
    )

    out = q_cadence_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["d"] = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    od = od.sort_values(["o_custkey", "d"])
    u = od["o_custkey"].to_numpy()
    d = od["d"].to_numpy()
    same = u[1:] == u[:-1]
    gap = (d[1:] - d[:-1])[same]
    later = d[1:][same]
    yr = pd.DatetimeIndex((later * 86_400_000_000)
                          .view("datetime64[us]")).year
    df = pd.DataFrame({"y": yr, "g": gap})
    years = sorted(df["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        g = np.sort(df.loc[df["y"] == row["year"],
                           "g"].to_numpy())
        n = len(g)
        assert row["n_gaps"] == n
        assert row["median_gap_days"] == g[(n + 1) // 2 - 1]
        assert abs(row["mean_gap_days"] - g.mean()) < 2e-6


def test_type_value_drift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_type_value_drift,
    )

    out = t_type_value_drift(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type", "value"])
    t = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    mid = (t.min() + t.max()) // 2
    ev["h"] = (t > mid).astype(int)
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    assert list(out["event_type"]) == \
        sorted(ev["event_type"].unique())
    for _, row in out.iterrows():
        g = ev[ev["event_type"] == row["event_type"]]
        m0 = g.loc[g["h"] == 0, "c"].mean()
        m1 = g.loc[g["h"] == 1, "c"].mean()
        assert abs(row["mean_first_cents"] - m0) < 2e-6
        assert abs(row["mean_second_cents"] - m1) < 2e-6
        assert abs(row["drift_ratio"] - m1 / m0) < 2e-5


def test_vocab_frontloading(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_vocab_frontloading,
    )

    out = d_vocab_frontloading(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    buckets = np.zeros(10, np.int64)
    shares = []
    for t in docs["text"].fillna(""):
        ws = t.split()
        if not ws:
            continue
        L = len(ws)
        first = {}
        for i, w in enumerate(ws):
            first.setdefault(w, i)
        k = len(first)
        early = sum(1 for i in first.values()
                    if 2 * (i + 1) <= L + 1)
        buckets[min(9, (10 * early) // k)] += 1
        shares.append(early / k)
    exp = {b: int(f) for b, f in enumerate(buckets) if f > 0}
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        assert row["n_docs"] == exp[int(row["bucket"])]
    assert abs(out.iloc[0]["mean_frontload_share"]
               - np.mean(shares)) < 2e-6
