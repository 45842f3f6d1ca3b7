"""Batch 130: intensity-value tradeoff, priority-as-customer-trait,
catalog name collisions."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_intensity_value_tradeoff(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_intensity_value_tradeoff,
    )

    out = t_intensity_value_tradeoff(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "value"])
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("user_id")["c"].agg(["size", "mean"])
    r = np.corrcoef(g["size"].to_numpy(float),
                    g["mean"].to_numpy(float))[0, 1]
    row = out.iloc[0]
    assert row["n_users"] == len(g)
    assert abs(row["intensity_value_r"] - r) < 1e-4


def test_priority_customer_trait(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_priority_customer_trait,
    )

    out = q_priority_customer_trait(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderpriority"])
    shares, singles = [], 0
    for _, g in od.groupby("o_custkey"):
        if len(g) < 2:
            continue
        vc = g["o_orderpriority"].value_counts()
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        shares.append(top[1] / len(g))
        singles += int(len(vc) == 1)
    row = out.iloc[0]
    assert row["n_customers"] == len(shares)
    assert abs(row["mean_modal_share"] - np.mean(shares)) < 2e-6
    assert abs(row["single_priority_share"]
               - singles / len(shares)) < 2e-6


def test_catalog_name_collision(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_catalog_name_collision,
    )

    out = q_catalog_name_collision(SF)
    p = pd.read_parquet(f"{SF}/part.parquet", columns=["p_name"])
    vc = p["p_name"].value_counts()
    exp = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == len(exp)
    for i, (nm, c) in enumerate(exp):
        row = out.iloc[i]
        assert row["rank"] == i + 1
        assert row["name"] == nm
        assert row["n_parts"] == c
    assert (out["n_names_total"] == p["p_name"].nunique()).all()
    assert abs(out.iloc[0]["collision_ratio"]
               - p["p_name"].nunique() / len(p)) < 2e-6
