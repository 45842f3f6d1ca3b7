"""Pearson residuals / CVaR vs brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pearson_residuals_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_pearson_residuals,
    )

    out = q_pearson_residuals(SF).set_index(["lang", "source"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"])
    piv = pd.crosstab(docs["lang"], docs["source"])
    n = piv.to_numpy().sum()
    assert len(out) == piv.shape[0] * piv.shape[1]
    for lang in piv.index:
        for src in piv.columns:
            o = int(piv.loc[lang, src])
            r, c = int(piv.loc[lang].sum()), int(piv[src].sum())
            e = r * c / n
            adj = (1 - r / n) * (1 - c / n)
            z = (o - e) / np.sqrt(e * adj)
            row = out.loc[(lang, src)]
            assert int(row["observed"]) == o
            assert abs(row["expected"] - e) < 5e-6
            assert abs(row["z"] - z) < 5e-5
            assert bool(row["flagged"]) == (abs(row["z"]) >= 2.0)


def test_cvar_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_cvar

    out = q_cvar(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    y = np.zeros(H, np.int64)
    np.add.at(y, h - lo, cents)
    ys = np.sort(y)
    k = H * 5 // 100
    assert int(out["n_hours"]) == H and int(out["k_tail"]) == k
    assert int(out["var_cents"]) == int(ys[max(k, 1) - 1])
    cvar = ys[:max(k, 1)].sum() / max(k, 1)
    assert abs(out["cvar_cents"] - cvar) < 5e-6
    # CVaR is at most VaR (tail mean of the worst can't exceed its cap)
    assert out["cvar_cents"] <= out["var_cents"] + 1e-9
