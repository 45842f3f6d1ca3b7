"""Nearest as-of join tie semantics + CCNet tercile bucketing properties."""

import numpy as np
import pandas as pd
import ray.data


def test_asof_nearest_tie_prefers_backward(ray_session):
    from complexity_driven_feature_construction_ray.stages.temporal import asof_join

    base = pd.Timestamp("2025-01-01")
    probes = pd.DataFrame({
        "pid": [1, 2, 3, 4],
        "k": [1, 1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=m) for m in (10, 19, 2, 5)],
    })
    events = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": [base + pd.Timedelta(minutes=m) for m in (8, 12, 50)],
        "v": [100.0, 200.0, 300.0],
    })
    out = asof_join(
        ray.data.from_pandas(probes), ray.data.from_pandas(events),
        key="k", probe_ts="ts", event_ts="ts", value_cols=["v"],
        direction="nearest",
    ).to_pandas().set_index("pid")["asof_v"]
    # pid 1 at min 10: events at 8 and 12 are equidistant -> earlier wins
    assert out[1] == 100.0
    # pid 2 at min 19: nearest is 12
    assert out[2] == 200.0
    # pid 3 at min 2: only later events exist -> forward attaches
    assert out[3] == 100.0
    # pid 4 key 2: nearest (and only) event is at min 50, forward
    assert out[4] == 300.0


def test_asof_nearest_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_asof_nearest

    out = t_asof_nearest("/root/testdata/sf0.001").to_pandas()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev[ev.event_type == "click"]
    p = (ev[ev.event_type == "purchase"].sort_values("event_id")
         .groupby(["user_id", "ts"], as_index=False).last())
    exp = {}
    for _, r in clicks.iterrows():
        cand = p[p.user_id == r.user_id]
        if not len(cand):
            exp[r.event_id] = None
            continue
        d = (cand.ts - r.ts).abs()
        best = d.min()
        tied = cand[d == best]
        # ties prefer the earlier event
        exp[r.event_id] = tied.sort_values("ts").iloc[0]["value"]
    got = out.set_index("event_id")["asof_value"]
    assert len(got) == len(exp)
    for eid, v in exp.items():
        g = got[eid]
        assert (pd.isna(g) and v is None) or g == v, eid


def test_ccnet_buckets_properties(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_ccnet_buckets

    out = d_ccnet_buckets("/root/testdata/sf0.001")
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    for lang, g in out.groupby("lang"):
        g = g.set_index("bucket")
        n = g["n_docs"].sum()
        # terciles: each bucket holds roughly a third
        assert (g["n_docs"] >= n // 6).all()
        order = [b for b in ("head", "middle", "tail") if b in g.index]
        means = g.loc[order, "avg_score"].to_numpy()
        assert (np.diff(means) >= 0).all(), lang
