"""Batch 147: value fingerprint quality, longevity-intensity
correlation, source interleaving audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_value_fingerprint_quality(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_value_fingerprint_quality,
    )

    out = q_value_fingerprint_quality(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_totalprice"])
    c = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    vc = pd.Series(c).value_counts()
    top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    row = out.iloc[0]
    assert row["n_orders"] == len(c)
    assert row["n_distinct_values"] == len(vc)
    assert abs(row["uniqueness_ratio"]
               - len(vc) / len(c)) < 2e-6
    assert row["top_value_cents"] == top[0]
    assert row["top_value_count"] == top[1]


def test_longevity_intensity_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_longevity_intensity_corr,
    )

    out = t_longevity_intensity_corr(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    a = ev.groupby("user_id")["d"].agg(
        ["min", "max", "size", "nunique"])
    x = (a["max"] - a["min"]).to_numpy(float)
    y = (a["size"] / a["nunique"]).to_numpy(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_users"] == len(a)
    assert abs(row["longevity_intensity_r"] - r) < 1e-4


def test_source_interleaving_audit(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_source_interleaving_audit,
    )

    out = d_source_interleaving_audit(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    dmax = docs["doc_id"].max()
    docs["first"] = (2 * docs["doc_id"] <= dmax).astype(int)
    g = docs.groupby("source")["first"].agg(["size", "sum"])
    overall = docs["first"].sum() / len(docs)
    assert list(out["source"]) == sorted(g.index)
    devs = []
    for _, row in out.iterrows():
        e = g.loc[row["source"]]
        assert row["n_docs"] == e["size"]
        sh = e["sum"] / e["size"]
        assert abs(row["first_half_share"] - sh) < 2e-6
        devs.append(abs(sh - overall))
    assert abs(out.iloc[0]["max_deviation"] - max(devs)) < 3e-6
