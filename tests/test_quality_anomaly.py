"""Gopher quality rules + per-user z-score anomaly vs brute-force oracles."""

import numpy as np
import pandas as pd


def test_gopher_rule_flags_unit(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import gopher_rule_flags

    ok = "the cat sat with all of " + " ".join(f"word{i}" for i in range(50))
    docs = pd.Series([
        ok,                                   # passes every rule
        "the of " + "hi " * 48,               # wc=50 boundary ok, mwl=2.16 -> fail_mwl
        "short the of doc",                   # wc < 50 -> fail_wc
        ok + " #" * 30,                       # 30 '#' of ~86 words -> fail_sym + alpha ok?
        ok.replace("the", "aaa").replace("of", "bbb"),  # no stop words -> fail_stop
        "the of " + "123 " * 60,              # numeric words -> fail_alpha
    ])
    f = gopher_rule_flags(docs)
    assert bool(f.loc[0, "keep"])
    assert bool(f.loc[1, "fail_mwl"]) and not f.loc[1, "keep"]
    assert bool(f.loc[2, "fail_wc"])
    assert bool(f.loc[3, "fail_sym"])
    assert bool(f.loc[4, "fail_stop"])
    assert bool(f.loc[5, "fail_alpha"])
    # rule independence: doc 2 fails wc but not the symbol rule
    assert not f.loc[2, "fail_sym"]


def test_gopher_filter_counts_consistent(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_gopher_filter

    out = d_gopher_filter("/root/testdata/sf0.001")
    assert (out["n_docs"] >= out["n_kept"]).all()
    # every injected slice exists at this sf, so every rule fires somewhere
    for c in ["fail_wc", "fail_mwl", "fail_sym", "fail_alpha", "fail_stop"]:
        assert out[c].sum() > 0, c
    assert out["n_kept"].sum() > 0


def test_t_anomaly_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_anomaly

    out = t_anomaly("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "user_id", "value"])
    g = ev.groupby("user_id")["value"]
    mu, sd = g.transform("mean"), g.transform("std")
    z = (ev["value"] - mu) / sd
    exp = ev[(sd > 0) & (z.abs() > 2.5)].copy()
    exp["z"] = z[exp.index].round(6)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(out) == len(exp) > 0
    assert (out["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
    np.testing.assert_allclose(out["z"].to_numpy(), exp["z"].to_numpy(), atol=1e-9)


def test_late_events_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_late_events

    out = t_late_events("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    ev.loc[ev.event_id % 37 == 5, "ts"] -= pd.Timedelta(minutes=45)
    exp = {}
    for uid, g in ev.sort_values("event_id").groupby("user_id"):
        run = g["ts"].cummax().shift(1)
        late = g[g["ts"] < run]
        if len(late):
            exp[uid] = (len(late), int(late["event_id"].min()))
    got = {int(r.user_id): (int(r.n_late), int(r.first_late))
           for _, r in out.iterrows()}
    assert got == exp and len(exp) > 0


def test_seasonality_counts(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_seasonality

    out = t_seasonality("/root/testdata/sf0.001")
    assert out["n"].sum() == 1000
    assert set(out["hour"]) <= set(range(24))


def test_rolling_centered_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_rolling_centered,
    )

    out = t_rolling_centered("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    exp = (ev.groupby("user_id")["value"]
             .rolling(window=5, center=True, min_periods=1).mean()
             .reset_index(drop=True))
    got = out.set_index("event_id").loc[ev["event_id"], "centered_mean"].to_numpy()
    np.testing.assert_allclose(got, exp.to_numpy(), atol=2e-6)


def test_split_leakage_counts(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_split_leakage,
    )

    out = d_split_leakage("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    clones = docs[docs.doc_id % 9 == 2].copy()
    clones["doc_id"] += 10_000_001
    both = pd.concat([docs, clones])
    both["split"] = np.where(both.doc_id % 10 < 8, "train", "valid")
    leaked = both.groupby("text")["split"].nunique()
    assert out.loc[0, "n_leaked_texts"] == int((leaked == 2).sum())
    assert out.loc[0, "n_train"] == int((both.split == "train").sum())
    assert out.loc[0, "n_leaked_texts"] > 0
