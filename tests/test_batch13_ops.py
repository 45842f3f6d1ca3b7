"""Rolling median / jackknife / preference pairs vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rolling_median_matches_pandas(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_rolling_median

    out = t_rolling_median(SF).to_pandas().set_index("event_id")["roll_median"]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    c = np.floor(ev["value"].to_numpy(np.float64) * 100 + 0.5)
    ref = (
        pd.Series(c, index=ev["event_id"].to_numpy())
        .groupby(ev["user_id"].to_numpy())
        .rolling(5, center=True, min_periods=1).median()
        .droplevel(0) / 100.0
    )
    assert len(out) == len(ref)
    assert np.array_equal(out.reindex(ref.index).to_numpy(), ref.to_numpy())
    # spot-check one interior window by hand
    uid = ev["user_id"].iloc[0]
    g = ev[ev["user_id"] == uid]
    if len(g) >= 5:
        mid = g.iloc[2]
        win = np.floor(g["value"].to_numpy(np.float64)[:5] * 100 + 0.5)
        assert out.loc[mid["event_id"]] == np.median(win) / 100.0


def test_jackknife_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_jackknife

    out = d_jackknife(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    S, N = int(docs["n_chars"].sum()), len(docs)
    G = docs["source"].nunique()
    mu = S / N
    for src, g in docs.groupby("source"):
        s, n = int(g["n_chars"].sum()), len(g)
        loo = (S - s) / (N - n)
        assert int(out.loc[src, "n"]) == n
        assert abs(out.loc[src, "loo_mean"] - loo) < 2e-6
        assert abs(out.loc[src, "pseudovalue"] - (G * mu - (G - 1) * loo)) < 1e-4
    # pseudo-values average back to ~the overall mean (jackknife identity)
    assert abs(out["pseudovalue"].mean() - mu) < 0.05


def test_preference_pairs_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_preference_pairs

    out = d_preference_pairs(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    for src, g in docs.groupby("source"):
        ranked = g.sort_values(["n_chars", "doc_id"])
        lo, hi = ranked.iloc[0], ranked.iloc[-1]
        assert int(out.loc[src, "chosen_doc"]) == int(hi["doc_id"])
        assert int(out.loc[src, "rejected_doc"]) == int(lo["doc_id"])
        assert int(out.loc[src, "chosen_chars"]) == int(hi["n_chars"])
        assert int(out.loc[src, "rejected_chars"]) == int(lo["n_chars"])
        assert int(out.loc[src, "margin"]) == int(hi["n_chars"] - lo["n_chars"])
        assert int(out.loc[src, "margin"]) >= 0
