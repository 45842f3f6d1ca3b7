"""Batch 156: congestion-monetization link, order-day habit,
suffix-character census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_load_value_link(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_load_value_link,
    )

    out = t_load_value_link(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "value"])
    ev["m"] = ev["ts"].values.astype("datetime64[us]") \
        .astype(np.int64) // 60_000_000
    ev["c"] = np.floor(ev["value"] * 100 + 0.5).astype(int)
    g = ev.groupby("m")["c"].agg(["size", "sum"]).reset_index()
    nm = len(g)
    k = int(np.ceil(nm / 10))
    g = g.sort_values(["size", "m"], ascending=[False, True])
    bn = g["size"].head(k).sum()
    bs = g["sum"].head(k).sum()
    rn = g["size"].iloc[k:].sum()
    rs = g["sum"].iloc[k:].sum()
    row = out.iloc[0]
    assert row["n_minutes"] == nm
    assert row["n_busy_minutes"] == k
    assert abs(row["mean_value_busy"] - bs / bn) < 2e-6
    assert abs(row["mean_value_rest"] - rs / rn) < 2e-6
    assert abs(row["busy_value_lift"]
               - (bs / bn) / (rs / rn)) < 2e-5


def test_order_dow_habit(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_dow_habit,
    )

    out = q_order_dow_habit(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    d = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    od["dow"] = (d + 4) % 7
    shares, habitual = [], 0
    for _, g in od.groupby("o_custkey"):
        if len(g) < 3:
            continue
        vc = g["dow"].value_counts()
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        sh = top[1] / len(g)
        shares.append(sh)
        habitual += int(sh > 0.5)
    row = out.iloc[0]
    assert row["n_customers"] == len(shares)
    assert abs(row["mean_modal_dow_share"]
               - np.mean(shares)) < 2e-6
    assert abs(row["habitual_share"]
               - habitual / len(shares)) < 2e-6


def test_suffix_char_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_suffix_char_census,
    )

    out = d_suffix_char_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    c = Counter()
    for t in docs["text"].fillna(""):
        for w in t.split():
            c[w[-1]] += 1
    tot = sum(c.values())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(out) == len(exp)
    for i, (ch, n) in enumerate(exp):
        row = out.iloc[i]
        assert row["char"] == ch
        assert row["n_tokens"] == n
        assert abs(row["share"] - n / tot) < 2e-6
