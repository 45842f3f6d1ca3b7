"""Batch 106: dormant-wealth census (TPC-H Q22 flavor), retention
half-life log-OLS fit, first-token boilerplate census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dormant_rich_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_dormant_rich,
    )

    out = q_dormant_rich(SF)
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od = od[od["o_orderdate"] >= pd.Timestamp("1999-01-01")]
    na = pd.read_parquet(f"{SF}/nation.parquet")
    cents = np.floor(cu["c_acctbal"] * 100 + 0.5).astype(int)
    pos = cents[cents > 0]
    s, n = int(pos.sum()), len(pos)
    cu = cu.assign(cents=cents)
    rich = cu[cents * n > s]
    drm = rich[~rich["c_custkey"].isin(set(od["o_custkey"]))]
    assert len(drm) > 0, "fixture must have dormant rich customers"
    g = drm.merge(na, left_on="c_nationkey", right_on="n_nationkey") \
        .groupby("n_name").agg(n=("cents", "size"),
                               bal=("cents", "sum"))
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["n_name"]]
        assert row["n_custs"] == e["n"]
        assert row["acctbal_cents"] == str(int(e["bal"]))


def test_retention_half_life_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_retention_half_life,
    )

    out = t_retention_half_life(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 86_400_000_000
    cells = ev[["user_id", "d"]].drop_duplicates()
    first = cells.groupby("user_id")["d"].transform("min")
    cells = cells.assign(k=(cells["d"] - first) // 7)
    nk = cells[["user_id", "k"]].drop_duplicates() \
        .groupby("k").size()
    pts = nk[(nk.index >= 1) & (nk.index <= 8)]
    m = len(pts)
    row = out.iloc[0]
    assert row["n_weeks_used"] == m
    if m >= 2:
        x = pts.index.to_numpy(float)
        y = np.log(pts.to_numpy(float))
        b = np.polyfit(x, y, 1)[0]
        assert abs(row["slope"] - b) < 2e-6
        if b < 0:
            assert abs(row["half_life_weeks"]
                       - np.log(2) / (-row["slope"])) < 2e-5


def test_first_token_census_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_first_token_census,
    )

    out = d_first_token_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    firsts = [t.split()[0] for t in docs["text"].fillna("")
              if t.split()]
    vc = pd.Series(firsts).value_counts()
    tot = int(vc.sum())
    exp = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(out) == len(exp)
    for i, (tok, n) in enumerate(exp):
        row = out.iloc[i]
        assert row["rank"] == i + 1
        assert row["token"] == tok
        assert row["n_docs"] == n
        assert abs(row["share"] - n / tot) < 2e-6
