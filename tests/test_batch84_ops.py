"""Batch 84: greedy coverage selection, depth-bucket conversion,
windowed funnel."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_coverage_select_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_coverage_select,
    )

    out = d_coverage_select(SF)
    dc = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = {int(r["doc_id"]): set((r["text"] or "").split())
            for _, r in dc.iterrows()}
    covered, chosen, expect = set(), set(), []
    for step in range(1, 6):
        best = None
        for did in sorted(toks):
            if did in chosen:
                continue
            gain = len(toks[did] - covered)
            if best is None or gain > best[0]:
                best = (gain, did)
        covered |= toks[best[1]]
        chosen.add(best[1])
        expect.append((step, best[1], best[0], len(covered)))
    got = list(out.itertuples(index=False, name=None))
    assert got == expect


def test_depth_conversion_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_depth_conversion,
    )

    out = t_depth_conversion(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"], kind="stable")
    cells = {}
    for _, g in ev.groupby("user_id"):
        t = g["us"].to_numpy()
        p = (g["event_type"].to_numpy(object) == "purchase")
        new = np.concatenate([[True], t[1:] - t[:-1] > 1_800_000_000])
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            mask = sid == s
            n = int(mask.sum())
            rank = 1 if n == 1 else 2 if n <= 4 else 3 if n <= 9 else 4
            cell = cells.setdefault(rank, [0, 0])
            cell[0] += 1
            cell[1] += int(p[mask].any())
    assert len(out) == len(cells)
    for _, r in out.iterrows():
        s, c = cells[r["depth_rank"]]
        assert r["n_sessions"] == s and r["n_converted"] == c
        assert abs(r["conv_rate"] - c / s) < 2e-6


def test_funnel_window_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_funnel_window,
    )

    out = t_funnel_window(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    nv = nc = npu = n7 = 0
    for _, g in ev.groupby("user_id"):
        vs = g.loc[g["event_type"] == "view", "us"]
        if not len(vs):
            continue
        fv = vs.min()
        nv += 1
        cs = g.loc[(g["event_type"] == "click") & (g["us"] > fv), "us"]
        if not len(cs):
            continue
        fc = cs.min()
        nc += 1
        ps = g.loc[(g["event_type"] == "purchase")
                   & (g["us"] > fc), "us"]
        if not len(ps):
            continue
        fp = ps.min()
        npu += 1
        n7 += int(fp - fv <= 7 * 86_400_000_000)
    r = out.iloc[0]
    assert (r["n_view"], r["n_click"], r["n_purchase"],
            r["n_purchase_7d"]) == (nv, nc, npu, n7)
    assert abs(r["conv_rate"] - npu / nv) < 2e-6
    assert abs(r["conv_rate_7d"] - n7 / nv) < 2e-6
