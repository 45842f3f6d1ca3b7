"""fe_polynomial / fe_cyclic / fe_crosshash vs brute force."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_polynomial_expansion_values(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        fe_polynomial,
    )

    # (l_orderkey, l_linenumber) is NOT unique in the synthetic table,
    # so compare sorted multisets of whole rows instead of joining
    cols = ["l_orderkey", "l_linenumber", "qty_sq", "disc_sq", "qty_disc", "qty_tax"]
    out = fe_polynomial(SF).to_pandas()[cols]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    exp = pd.DataFrame(
        {
            "l_orderkey": li["l_orderkey"],
            "l_linenumber": li["l_linenumber"],
            "qty_sq": (li["l_quantity"] ** 2).round(6),
            "disc_sq": (li["l_discount"] ** 2).round(6),
            "qty_disc": (li["l_quantity"] * li["l_discount"]).round(6),
            "qty_tax": (li["l_quantity"] * li["l_tax"]).round(6),
        }
    )
    a = out.round(6).sort_values(cols).reset_index(drop=True)
    b = exp.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=2e-6)


def test_cyclic_encoding_circle_property(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_cyclic

    out = fe_cyclic(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts"])
    j = out.merge(ev, on="event_id")
    assert (j["hour"] == j["ts"].dt.hour).all()
    # points lie on the unit circle and encode the hour angle
    r2 = j["hour_sin"] ** 2 + j["hour_cos"] ** 2
    np.testing.assert_allclose(r2, 1.0, atol=1e-5)
    ang = 2 * np.pi * j["hour"] / 24
    np.testing.assert_allclose(j["hour_sin"], np.sin(ang), atol=2e-6)
    # hour 23 and hour 0 are close in the encoding (the point of it)
    p23 = np.array([np.sin(2 * np.pi * 23 / 24), np.cos(2 * np.pi * 23 / 24)])
    p0 = np.array([0.0, 1.0])
    p12 = np.array([np.sin(np.pi), np.cos(np.pi)])
    assert np.linalg.norm(p23 - p0) < np.linalg.norm(p12 - p0)


def test_crosshash_deterministic_and_spread(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        fe_crosshash,
    )

    out = fe_crosshash(SF).to_pandas()
    assert out["cross_bucket"].between(0, 127).all()
    # same (user, type) always lands in the same bucket
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    j = out.merge(ev, on="event_id")
    per_pair = j.groupby(["user_id", "event_type"])["cross_bucket"].nunique()
    assert (per_pair == 1).all()
    # the cross spreads: many distinct buckets in use
    assert j["cross_bucket"].nunique() > 64
