"""Batch 85: template skeleton census, nation rank churn,
wealth-decile activity."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _skel(text):
    return "".join(
        "s" if len(t) <= 3 else "m" if len(t) <= 6 else "l"
        for t in (text or "").split()[:12])


def test_template_census_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_template_census,
    )

    out = d_template_census(SF).iloc[0]
    dc = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    clusters: dict = {}
    for t in dc["text"].fillna(""):
        clusters.setdefault(_skel(t), set()).add(t)
    counts: dict = {}
    for t in dc["text"].fillna(""):
        counts[_skel(t)] = counts.get(_skel(t), 0) + 1
    tpl = {sk: c for sk, c in counts.items() if c >= 2}
    assert out["n_docs"] == len(dc)
    assert out["n_skeletons"] == len(counts)
    assert out["n_template_clusters"] == len(tpl)
    assert out["n_templated_docs"] == sum(tpl.values())
    assert out["n_poly_clusters"] == sum(
        1 for sk in tpl if len(clusters[sk]) >= 2)
    assert out["max_cluster"] == max(counts.values())
    assert abs(out["templated_share"]
               - sum(tpl.values()) / len(dc)) < 2e-6


def test_rank_churn_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_rank_churn,
    )

    out = q_rank_churn(SF).iloc[0]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    od = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey") \
          .merge(cu, left_on="o_custkey", right_on="c_custkey")
    cents = np.floor(j["l_extendedprice"].to_numpy() * 100
                     + 0.5).astype(np.int64)
    disc = np.floor(j["l_discount"].to_numpy() * 100
                    + 0.5).astype(np.int64)
    j["rev"] = cents * (100 - disc)
    j["d"] = (j["o_orderdate"].astype("datetime64[us]")
              .astype(np.int64) // 86_400_000_000)
    mid = (int(j["d"].min()) + int(j["d"].max())) // 2
    r0 = j[j["d"] <= mid].groupby("c_nationkey")["rev"].sum()
    r1 = j[j["d"] > mid].groupby("c_nationkey")["rev"].sum()
    nks = sorted(set(r0.index) | set(r1.index))
    x = [int(r0.get(k, 0)) for k in nks]
    y = [int(r1.get(k, 0)) for k in nks]
    conc = disco = n1 = n2 = 0
    for i in range(len(nks)):
        for k in range(i + 1, len(nks)):
            dx, dy = x[i] - x[k], y[i] - y[k]
            n1 += dx == 0
            n2 += dy == 0
            if (dx > 0) == (dy > 0) and dx != 0 and dy != 0:
                conc += 1
            elif dx != 0 and dy != 0:
                disco += 1
    n0 = len(nks) * (len(nks) - 1) // 2
    assert (out["n_nations"], out["concordant"], out["discordant"],
            out["ties_first"], out["ties_second"]) == (
        len(nks), conc, disco, n1, n2)
    tau = (conc - disco) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(out["tau_b"] - tau) < 2e-6


def test_wealth_activity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_wealth_activity,
    )

    out = q_wealth_activity(SF)
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"])
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    x = np.floor(cu["c_acctbal"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    nord = cu["c_custkey"].map(
        od.groupby("o_custkey").size()).fillna(0).to_numpy(np.int64)
    n = len(cu)
    srt = np.sort(x)
    # SQL mirror: 1-based rank element at (k*n+9)//10
    cuts = [int(srt[(k * n + 9) // 10 - 1]) for k in range(1, 10)]
    dec = np.array([sum(c < v for c in cuts) for v in x])
    cells = {}
    for d, b, o in zip(dec, nord > 0, nord):
        c = cells.setdefault(int(d), [0, 0, 0])
        c[0] += 1
        c[1] += int(b)
        c[2] += int(o)
    assert len(out) == len(cells)
    for _, r in out.iterrows():
        ncu, nbu, nor = cells[r["decile"]]
        assert (r["n_customers"], r["n_buyers"],
                r["n_orders"]) == (ncu, nbu, nor)
        assert abs(r["buyer_share"] - nbu / ncu) < 2e-6
        assert abs(r["orders_per_customer"] - nor / ncu) < 2e-6
