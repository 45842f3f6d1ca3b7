"""Pinball loss / odds ratio vs brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pinball_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_pinball,
    )

    out = t_pinball(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "ts"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    q = 0.9
    for et in ev["event_type"].unique():
        y = np.bincount(h[ev["event_type"].to_numpy() == et] - lo,
                        minlength=H).astype(np.float64)
        e = y[24:] - y[:-24]
        loss = (q * np.maximum(e, 0) + (1 - q) * np.maximum(-e, 0)).mean()
        assert int(out.loc[et, "n_forecasts"]) == H - 24
        assert abs(out.loc[et, "mean_pinball"] - loss) < 5e-6
        # x10 integer fold roundtrips
        assert int(out.loc[et, "loss_x10"]) == int(round(
            (9 * np.maximum(e, 0) - np.minimum(e, 0)).sum()))


def test_odds_ratio_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_odds_ratio,
    )

    out = q_odds_ratio(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    buyers = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    users = ev["user_id"].unique()
    a = sum(1 for u in users if u % 2 == 1 and u in buyers)
    b = sum(1 for u in users if u % 2 == 1 and u not in buyers)
    c = sum(1 for u in users if u % 2 == 0 and u in buyers)
    d = sum(1 for u in users if u % 2 == 0 and u not in buyers)
    assert (int(out["a"]), int(out["b"]), int(out["c"]), int(out["d"])) \
        == (a, b, c, d)
    if min(a, b, c, d) > 0:
        orr = a * d / (b * c)
        se = np.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
        assert abs(out["odds_ratio"] - orr) < 5e-6
        assert abs(out["ci_lo"] - np.exp(np.log(orr) - 1.96 * se)) < 5e-5
        assert abs(out["ci_hi"] - np.exp(np.log(orr) + 1.96 * se)) < 5e-5
        assert out["ci_lo"] <= out["odds_ratio"] <= out["ci_hi"]
