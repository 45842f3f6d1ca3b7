"""HHI concentration / hour-entropy regularity vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_hhi_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_hhi

    out = q_hhi(SF).iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    rev = o.assign(c=np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5)
                   .astype(np.int64)).groupby("o_custkey")["c"].sum()
    shares = rev / rev.sum()
    hhi = float((shares ** 2).sum())
    assert int(out["n_customers"]) == len(rev)
    assert int(out["total_cents"]) == int(rev.sum())
    assert abs(out["hhi"] - hhi) < 5e-6
    assert abs(out["effective_n"] - 1 / hhi) < 5e-2
    # bounds: 1/n <= HHI <= 1
    assert 1 / len(rev) - 1e-9 <= out["hhi"] <= 1.0 + 1e-9


def test_hour_entropy_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_hour_entropy,
    )

    out = t_hour_entropy(SF).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    hr = (ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
          // 3_600_000_000) % 24
    for uid, g in ev.assign(hr=hr).groupby("user_id"):
        cnt = g["hr"].value_counts().to_numpy(np.float64)
        p = cnt / cnt.sum()
        h = float(-(p * np.log(p)).sum())
        assert int(out.loc[uid, "n_events"]) == len(g)
        assert int(out.loc[uid, "n_hours_used"]) == len(cnt)
        assert abs(out.loc[uid, "entropy"] - h) < 5e-5
        assert abs(out.loc[uid, "regularity"] - h / np.log(24)) < 5e-5
        assert -1e-9 <= out.loc[uid, "regularity"] <= 1.0 + 1e-5
