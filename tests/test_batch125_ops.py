"""Batch 125: customer order lifespan, order dow profile,
degenerate-document census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_customer_lifespan_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_customer_lifespan,
    )

    out = q_customer_lifespan(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    od["d"] = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    g = od.groupby("o_custkey")["d"].agg(["min", "max", "size"])
    single = int((g["size"] == 1).sum())
    span = np.sort((g.loc[g["size"] >= 2, "max"]
                    - g.loc[g["size"] >= 2, "min"]).to_numpy())
    n = len(span)
    row = out.iloc[0]
    assert row["n_repeat_customers"] == n
    assert row["n_single_order"] == single
    assert row["median_span_days"] == span[(n + 1) // 2 - 1]
    assert row["p90_span_days"] == span[int(np.ceil(0.9 * n)) - 1]
    assert abs(row["mean_span_days"] - span.mean()) < 2e-6


def test_order_dow_profile_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_order_dow_profile,
    )

    out = q_order_dow_profile(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderdate"])
    d = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    dow = (d + 4) % 7
    obs = pd.Series(dow).value_counts().sort_index()
    base = np.zeros(7, np.int64)
    for dd in range(d.min(), d.max() + 1):
        base[(dd + 4) % 7] += 1
    nd = d.max() - d.min() + 1
    N = len(d)
    chi2 = 0.0
    assert list(out["dow"]) == list(obs.index)
    for _, row in out.iterrows():
        dw = int(row["dow"])
        assert row["observed"] == obs[dw]
        e = N * base[dw] / nd
        assert abs(row["expected"] - e) < 2e-6
        chi2 += (obs[dw] - e) ** 2 / e
    assert abs(out.iloc[0]["chi2"] - chi2) < 1e-3


def test_doc_empty_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_doc_empty_audit,
    )

    out = d_doc_empty_audit(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    raw = docs["text"]
    isnull = raw.isna()
    s = raw.fillna("")
    emp = ((~isnull) & (s.str.len() == 0)).sum()
    ws = ((~isnull) & s.str.match(r"^\s+$")).sum()
    sh = ((~isnull) & (s.str.len() > 0)
          & (s.str.len() < 10)).sum()
    row = out.iloc[0]
    assert row["n_docs"] == len(s)
    assert row["n_null"] == isnull.sum()
    assert row["n_empty"] == emp
    assert row["n_ws_only"] == ws
    assert row["n_under_10_chars"] == sh
    assert abs(row["degenerate_share"]
               - (isnull.sum() + emp + ws + sh) / len(s)) < 2e-6
