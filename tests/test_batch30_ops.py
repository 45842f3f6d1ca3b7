"""Heaps exponent / max drawdown / growth accounting vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_heaps_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_heaps

    out = d_heaps(SF).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    thr = int(np.sort(docs["doc_id"].to_numpy())[len(docs) // 2 - 1])
    full_toks, half_toks = [], []
    for _, r in docs.iterrows():
        toks = (r["text"] or "").split()
        full_toks.extend(toks)
        if r["doc_id"] <= thr:
            half_toks.extend(toks)
    n_f, v_f = len(full_toks), len(set(full_toks))
    n_h, v_h = len(half_toks), len(set(half_toks))
    assert int(out["n_full"]) == n_f and int(out["v_full"]) == v_f
    assert int(out["n_half"]) == n_h and int(out["v_half"]) == v_h
    beta = np.log(v_f / v_h) / np.log(n_f / n_h)
    assert abs(out["beta"] - beta) < 5e-6
    # sublinear vocabulary growth: 0 <= beta <= 1 for natural corpora
    assert -1e-9 <= out["beta"] <= 1.0 + 1e-9


def test_drawdown_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_drawdown,
    )

    out = t_drawdown(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    h = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 3_600_000_000
    lo, hi = int(h.min()), int(h.max())
    H = hi - lo + 1
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    y = np.zeros(H, np.int64)
    np.add.at(y, h - lo, cents)
    run = np.cumsum(y)
    dd = np.maximum.accumulate(run) - run
    best = int(np.argmax(dd))
    assert int(out["n_hours"]) == H
    assert int(out["max_drawdown_cents"]) == int(dd[best])
    assert int(out["trough_hour"]) == best + lo
    assert int(out["final_cents"]) == int(run[-1])
    assert out["max_drawdown_cents"] >= 0


def test_growth_accounting_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_growth_accounting,
    )

    out = t_growth_accounting(SF).set_index("week")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    w = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) \
        // (7 * 24 * 3_600_000_000)
    p = pd.DataFrame({"u": ev["user_id"], "w": w}).drop_duplicates()
    first = p.groupby("u")["w"].min()
    weeks = range(int(p["w"].min()), int(p["w"].max()) + 1)
    prev = set()
    for wk in weeks:
        cur = set(p.loc[p["w"] == wk, "u"])
        active = len(cur)
        new = int((first == wk).sum())
        retained = len(cur & prev)
        assert int(out.loc[wk, "active"]) == active
        assert int(out.loc[wk, "new"]) == new
        assert int(out.loc[wk, "retained"]) == retained
        assert int(out.loc[wk, "resurrected"]) == active - new - retained
        assert int(out.loc[wk, "churned"]) == len(prev) - retained
        # identity: every active user is new, retained or resurrected
        assert active == new + retained + int(out.loc[wk, "resurrected"])
        prev = cur
