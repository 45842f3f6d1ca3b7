"""Batch 149: next-day stickiness, concurrency distribution,
top-customer share trend."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_nextday_stickiness(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_nextday_stickiness,
    )

    out = t_nextday_stickiness(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["d"] = ev["ts"].values.astype("datetime64[D]") \
        .astype(np.int64)
    cells = ev[["user_id", "d"]].drop_duplicates() \
        .sort_values(["user_id", "d"])
    dmax = cells["d"].max()
    u = cells["user_id"].to_numpy()
    d = cells["d"].to_numpy()
    base = int((d < dmax).sum())
    same = u[1:] == u[:-1]
    ret = int(((d[1:] - d[:-1]) == 1)[same].sum())
    row = out.iloc[0]
    assert row["n_user_days"] == base
    assert row["n_nextday_returns"] == ret
    assert abs(row["nextday_stickiness"] - ret / base) < 2e-6


def test_concurrency_histogram(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_concurrency_histogram,
    )

    out = t_concurrency_histogram(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["m"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 60_000_000
    per = ev.groupby("m")["user_id"].nunique()
    c = np.sort(per.to_numpy())
    n = len(c)
    row = out.iloc[0]
    assert row["n_minutes"] == n
    assert row["p50_concurrency"] == c[(n + 1) // 2 - 1]
    assert row["p99_concurrency"] == c[int(np.ceil(0.99 * n)) - 1]
    assert row["max_concurrency"] == c[-1]


def test_top_customer_share_trend(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_top_customer_share_trend,
    )

    out = q_top_customer_share_trend(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["y"] = od["o_orderdate"].dt.year
    od["c"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype(int)
    r = od.groupby(["y", "o_custkey"])["c"].sum().reset_index()
    years = sorted(r["y"].unique())
    assert list(out["year"]) == years
    for _, row in out.iterrows():
        grp = r[r["y"] == row["year"]] \
            .sort_values(["c", "o_custkey"],
                         ascending=[False, True])
        tot = grp["c"].sum()
        assert row["n_customers"] == len(grp)
        assert abs(row["top1_share"]
                   - grp["c"].iloc[0] / tot) < 2e-6
        assert abs(row["top10_share"]
                   - grp["c"].head(10).sum() / tot) < 2e-6
