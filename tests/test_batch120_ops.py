"""Batch 120: paycheck-cycle audit, gap-value correlation,
last-token footer census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_paycheck_cycle_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_paycheck_cycle,
    )

    out = q_paycheck_cycle(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate"])
    dom = od["o_orderdate"].dt.day
    obs = dom.value_counts().sort_index()
    days = pd.date_range(od["o_orderdate"].min().normalize(),
                         od["o_orderdate"].max().normalize(),
                         freq="D")
    base = pd.Series(days.day).value_counts().sort_index()
    N, nd = len(od), len(days)
    assert list(out["dom"]) == list(obs.index)
    chi2 = 0.0
    for _, row in out.iterrows():
        d = int(row["dom"])
        assert row["observed"] == obs[d]
        e = N * base[d] / nd
        assert abs(row["expected"] - e) < 2e-6
        chi2 += (obs[d] - e) ** 2 / e
    assert abs(out.iloc[0]["chi2"] - chi2) < 1e-3


def test_gap_value_corr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_gap_value_corr,
    )

    out = t_gap_value_corr(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["sec"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    u = ev["user_id"].to_numpy()
    sec = ev["sec"].to_numpy()
    c = ev["c"].to_numpy()
    same = u[1:] == u[:-1]
    x = ((sec[1:] - sec[:-1]) // 60)[same].astype(float)
    y = c[1:][same].astype(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_pairs"] == len(x)
    assert abs(row["gap_value_r"] - r) < 2e-6


def test_last_token_census_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_last_token_census,
    )

    out = d_last_token_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    lasts = [t.split()[-1] for t in docs["text"].fillna("")
             if t.split()]
    vc = pd.Series(lasts).value_counts()
    tot = int(vc.sum())
    exp = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(out) == len(exp)
    for i, (tok, n) in enumerate(exp):
        row = out.iloc[i]
        assert row["rank"] == i + 1
        assert row["token"] == tok
        assert row["n_docs"] == n
        assert abs(row["share"] - n / tot) < 2e-6
