"""Mahalanobis census / partial correlation vs brute-force references
at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_mahalanobis_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_mahalanobis,
    )

    out = q_mahalanobis(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    x = li["l_quantity"].to_numpy(np.float64)
    y = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    cov = np.cov(x, y, ddof=1)
    inv = np.linalg.inv(cov)
    d = np.stack([x - x.mean(), y - y.mean()])
    d2 = np.einsum("in,ij,jn->n", d, inv, d)
    assert int(out["n"]) == len(x)
    assert int(out["n_outliers"]) == int((d2 > 9.0).sum())
    assert abs(out["mean_qty"] - x.mean()) < 5e-6
    assert abs(out["mean_price_cents"] - y.mean()) < 5e-6
    r = np.corrcoef(x, y)[0, 1]
    assert abs(out["corr"] - r) < 5e-6
    # 3-sigma ellipse excludes most points
    assert out["n_outliers"] < 0.2 * out["n"]


def test_partial_corr_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_partial_corr,
    )

    out = q_partial_corr(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])
    x = li["l_quantity"].to_numpy(np.float64)
    y = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    z = np.floor(li["l_discount"].to_numpy() * 100 + 0.5)
    r_xy = np.corrcoef(x, y)[0, 1]
    r_xz = np.corrcoef(x, z)[0, 1]
    r_yz = np.corrcoef(y, z)[0, 1]
    part = (r_xy - r_xz * r_yz) / np.sqrt((1 - r_xz ** 2)
                                          * (1 - r_yz ** 2))
    assert int(out["n"]) == len(x)
    assert abs(out["r_xy"] - r_xy) < 5e-6
    assert abs(out["r_xz"] - r_xz) < 5e-6
    assert abs(out["r_yz"] - r_yz) < 5e-6
    assert abs(out["partial_r"] - part) < 5e-5
    assert -1.0 - 1e-9 <= out["partial_r"] <= 1.0 + 1e-9
