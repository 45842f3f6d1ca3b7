"""Batch 111: brand price premium, annual repurchase ledger,
reactivation-moment pricing."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_brand_price_premium_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_brand_price_premium,
    )

    out = q_brand_price_premium(SF)
    p = pd.read_parquet(f"{SF}/part.parquet",
                        columns=["p_brand", "p_retailprice"])
    p["cents"] = np.floor(p["p_retailprice"] * 100 + 0.5).astype(int)
    g = p.groupby("p_brand").agg(n=("cents", "size"),
                                 s=("cents", "sum"))
    gm = p["cents"].sum() / len(p)
    assert len(out) == len(g)
    assert set(out["brand"]) == set(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["brand"]]
        assert row["n_parts"] == e["n"]
        assert abs(row["mean_price_cents"] - e["s"] / e["n"]) < 2e-6
        assert abs(row["premium"] - (e["s"] / e["n"]) / gm) < 2e-6
    # ordered by premium desc
    pr = out["premium"].to_numpy()
    assert (pr[:-1] >= pr[1:]).all()


def test_annual_repurchase_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_annual_repurchase,
    )

    out = q_annual_repurchase(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["y"] = od["o_orderdate"].dt.year
    cy = od[["o_custkey", "y"]].drop_duplicates()
    pairs = set(zip(cy["o_custkey"], cy["y"]))
    g = cy.groupby("y").size().sort_index()
    years = g.index.to_numpy()
    assert len(out) == len(years) - 1
    for _, row in out.iterrows():
        y = int(row["year"])
        active = cy[cy["y"] == y]
        ret = sum(1 for u in active["o_custkey"]
                  if (u, y + 1) in pairs)
        assert row["n_active_customers"] == len(active)
        assert row["n_retained"] == ret
        assert abs(row["repurchase_rate"]
                   - ret / len(active)) < 2e-6


def test_reactivation_value_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_reactivation_value,
    )

    out = t_reactivation_value(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["sec"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    u = ev["user_id"].to_numpy()
    sec = ev["sec"].to_numpy()
    react = np.zeros(len(ev), bool)
    same = u[1:] == u[:-1]
    react[1:] = same & (sec[1:] - sec[:-1] >= 7 * 86_400)
    c = ev["cents"].to_numpy()
    row = out.iloc[0]
    assert row["n_reactivation_events"] == react.sum()
    assert row["n_other_events"] == (~react).sum()
    if react.sum():
        assert abs(row["mean_reactivation_cents"]
                   - c[react].mean()) < 2e-6
        assert abs(row["reactivation_lift"]
                   - c[react].mean() / c[~react].mean()) < 2e-5
    assert abs(row["mean_other_cents"] - c[~react].mean()) < 2e-6
