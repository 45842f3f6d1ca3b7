"""Batch 144: rest effect, spend-peak position, wrapper-token
census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rest_effect(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_rest_effect,
    )

    out = t_rest_effect(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["t"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64)
    u = ev["user_id"].to_numpy()
    t = ev["t"].to_numpy()
    new = np.ones(len(ev), dtype=int)
    same = u[1:] == u[:-1]
    new[1:][same & (t[1:] - t[:-1] <= 30 * 60 * 1_000_000)] = 0
    ev["sid"] = np.cumsum(new)
    per = ev.groupby("sid").agg(u=("user_id", "first"),
                                st=("t", "min"), en=("t", "max"),
                                n=("t", "size"))
    pu = per["u"].to_numpy()
    same_s = pu[1:] == pu[:-1]
    x = ((per["st"].to_numpy()[1:]
          - per["en"].to_numpy()[:-1]) // 60_000_000)[same_s] \
        .astype(float)
    y = per["n"].to_numpy()[1:][same_s].astype(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_session_pairs"] == len(x)
    assert abs(row["rest_engagement_r"] - r) < 2e-6


def test_spend_peak_position(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_spend_peak_position,
    )

    out = q_spend_peak_position(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["y"] = od["o_orderdate"].dt.year
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    r = od.groupby(["o_custkey", "y"])["c"].sum().reset_index()
    pos = {"start": 0, "middle": 0, "end": 0}
    for u, g in r.groupby("o_custkey"):
        if g["y"].nunique() < 3:
            continue
        g = g.sort_values(["c", "y"], ascending=[False, True])
        peak = int(g.iloc[0]["y"])
        if peak == g["y"].min():
            pos["start"] += 1
        elif peak == g["y"].max():
            pos["end"] += 1
        else:
            pos["middle"] += 1
    tot = sum(pos.values())
    present = {k: v for k, v in pos.items() if v > 0}
    assert len(out) == len([k for k in pos if pos[k] > 0]) or \
        len(out) == 3
    for _, row in out.iterrows():
        k = row["peak_position"]
        assert row["n_customers"] == pos[k]
        assert abs(row["share"] - pos[k] / tot) < 2e-6


def test_wrap_token_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_wrap_token_census,
    )

    out = d_wrap_token_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    wraps = Counter()
    n_docs = 0
    for txt in docs["text"].fillna(""):
        ws = txt.split()
        if not ws:
            continue
        n_docs += 1
        if len(ws) >= 2 and ws[0] == ws[-1]:
            wraps[ws[0]] += 1
    n_wrap = sum(wraps.values())
    exp = sorted(wraps.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert len(out) == len(exp)
    for i, (tok, c) in enumerate(exp):
        row = out.iloc[i]
        assert row["token"] == tok
        assert row["n_docs"] == c
    if len(out):
        assert abs(out.iloc[0]["wrap_share"]
                   - n_wrap / n_docs) < 2e-6
