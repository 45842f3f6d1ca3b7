"""Batch 76: segment revenue (Q3 chain), transition asymmetry,
priority SLA."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_segment_revenue_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_segment_revenue,
    )

    out = q_segment_revenue(SF).set_index("segment")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey"))
    c = np.floor(j["l_extendedprice"].to_numpy() * 100 + 0.5).astype(object)
    d = np.floor(j["l_discount"].to_numpy() * 100 + 0.5).astype(int)
    j["rev"] = c * (100 - d)
    j["dbps"] = d * 100
    for seg, g in j.groupby("c_mktsegment"):
        r = out.loc[seg]
        assert r["n_lines"] == len(g)
        assert abs(r["revenue"] - int(g["rev"].sum()) / 1e4) < 2e-2
        assert abs(r["avg_discount_bps"]
                   - g["dbps"].sum() / len(g)) < 2e-4
    assert int(out["n_lines"].sum()) == len(j)


def test_transition_asymmetry_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_transition_asymmetry,
    )

    out = t_transition_asymmetry(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(
        ["user_id", "ts", "event_id"], kind="stable")
    same = ev["user_id"].to_numpy()[1:] == ev["user_id"].to_numpy()[:-1]
    cur = ev["event_type"].to_numpy(object)[:-1][same]
    nxt = ev["event_type"].to_numpy(object)[1:][same]
    from collections import Counter
    flow = Counter(zip(cur, nxt))
    types = sorted({t for pair in flow for t in pair})
    asym = sym = pairs = 0
    best = None
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            ab, ba = flow.get((a, b), 0), flow.get((b, a), 0)
            if ab + ba == 0:
                continue
            pairs += 1
            net = abs(ab - ba)
            asym += net
            sym += ab + ba
            if best is None or net > best[2]:
                f, t = (a, b) if ab >= ba else (b, a)
                best = (f, t, net)
    assert out["n_pairs_active"].iloc[0] == pairs
    assert out["offdiag_flow"].iloc[0] == sym
    assert out["net_flow"].iloc[0] == asym
    assert abs(out["asym_index"].iloc[0] - asym / sym) < 2e-6
    assert out["top_from"].iloc[0] == best[0]
    assert out["top_to"].iloc[0] == best[1]
    assert out["top_net"].iloc[0] == best[2]


def test_priority_sla_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_priority_sla,
    )

    out = q_priority_sla(SF).set_index("priority")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate",
                                  "o_orderpriority"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    gap = (j["l_shipdate"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000
           - j["o_orderdate"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    j["gap"] = gap
    for pri, g in j.groupby("o_orderpriority"):
        r = out.loc[pri]
        n = len(g)
        assert r["n_lines"] == n
        assert abs(r["within_30d"] - (g["gap"] <= 30).sum() / n) < 2e-6
        assert abs(r["within_60d"] - (g["gap"] <= 60).sum() / n) < 2e-6
        assert abs(r["within_90d"] - (g["gap"] <= 90).sum() / n) < 2e-6
        # shares are monotone in the threshold
        assert r["within_30d"] <= r["within_60d"] <= r["within_90d"]
