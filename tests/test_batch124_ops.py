"""Batch 124: embedding quality pre-flight, dead-day census,
zero-value instrumentation audit."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_embed_quality_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_quality_audit,
    )

    out = d_embed_quality_audit(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(emb, axis=1)
    row = out.iloc[0]
    assert row["n_vecs"] == len(em)
    assert row["n_distinct_dims"] == 1
    assert row["n_zero_norm"] == (norms < 5e-7).sum()
    assert row["n_nonfinite"] == 0
    assert row["n_dup_ids"] == em["vec_id"].duplicated().sum()
    assert abs(row["min_norm"] - norms.min()) < 2e-6
    assert abs(row["max_norm"] - norms.max()) < 2e-6


def test_dead_days_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_dead_days,
    )

    out = q_dead_days(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate"])
    d = np.unique(od["o_orderdate"].values
                  .astype("datetime64[D]").astype(np.int64))
    span = int(d.max() - d.min() + 1)
    alive = np.zeros(span, bool)
    alive[d - d.min()] = True
    dead = int((~alive).sum())
    longest = run = 0
    for a in alive:
        run = 0 if a else run + 1
        longest = max(longest, run)
    row = out.iloc[0]
    assert row["span_days"] == span
    assert row["dead_days"] == dead
    assert abs(row["dead_share"] - dead / span) < 2e-6
    assert row["longest_dead_run"] == longest


def test_zero_value_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_zero_value_audit,
    )

    out = t_zero_value_audit(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    ev["z"] = (np.floor(ev["value"] * 100 + 0.5)
               .astype(int) == 0).astype(int)
    g = ev.groupby("event_type")["z"].agg(["size", "sum"])
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_events"] == e["size"]
        assert row["n_zero_value"] == e["sum"]
        assert abs(row["zero_share"] - e["sum"] / e["size"]) < 2e-6
