"""Batch 103: negative-binomial fit to daily counts, within-order
discount uniformity audit, tax-band census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_nb_fit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_nb_fit,
    )

    out = t_nb_fit(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    d = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    cnt = pd.Series(d).value_counts()
    full = pd.Series(0, index=range(int(d.min()), int(d.max()) + 1),
                     dtype=np.int64)
    full.update(cnt)
    y = full.to_numpy(np.float64)
    mu, var = y.mean(), y.var()
    row = out.iloc[0]
    assert row["n_days"] == len(y)
    assert abs(row["mean_per_day"] - mu) < 2e-6
    assert abs(row["var_per_day"] - var) < max(1e-4, var * 1e-9)
    assert abs(row["dispersion_index"] - var / mu) < 1e-4
    if var > mu:
        assert abs(row["nb_r"] - mu * mu / (var - mu)) < 1e-3
        assert abs(row["nb_p"] - mu / var) < 1e-4
    else:
        assert row["nb_r"] == 0.0 and row["nb_p"] == 0.0


def test_order_discount_uniformity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_discount_uniformity,
    )

    out = q_order_discount_uniformity(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount"])
    li["d"] = np.floor(li["l_discount"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    g = li.groupby("l_orderkey")["d"].agg(["min", "max"])
    rng = (g["max"] - g["min"]).to_numpy(np.int64)
    row = out.iloc[0]
    assert row["n_orders"] == len(g)
    assert row["n_uniform"] == int((rng == 0).sum())
    assert abs(row["uniform_share"] - (rng == 0).mean()) < 2e-6
    assert abs(row["mean_range_bp"] - rng.mean()) < 2e-6
    assert row["max_range_bp"] == int(rng.max())


def test_tax_bands_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_tax_bands,
    )

    out = q_tax_bands(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_tax", "l_extendedprice"])
    li["t"] = np.floor(li["l_tax"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    g = li.groupby("t").agg(n=("c", "size"), c=("c", "sum"))
    n_tot, c_tot = len(li), int(g["c"].sum())
    assert len(out) == len(g)
    for _, row in out.iterrows():
        e = g.loc[row["tax_bp"]]
        assert row["n_lines"] == e["n"]
        assert int(row["revenue_cents"]) == int(e["c"])
        assert abs(row["line_share"] - e["n"] / n_tot) < 2e-6
        assert abs(row["revenue_share"] - int(e["c"]) / c_tot) < 2e-6
