"""Batch 56: price elasticity, retention rate matrix, completeness."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
WEEK_US = 604_800_000_000


def test_elasticity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_elasticity,
    )

    out = q_elasticity(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    x = np.log(np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5))
    y = np.log(np.floor(li["l_quantity"].to_numpy() + 0.5))
    n = len(x)
    slope = ((n * (x * y).sum() - x.sum() * y.sum())
             / (n * (x * x).sum() - x.sum() ** 2))
    assert out["n"].iloc[0] == n
    assert abs(out["elasticity"].iloc[0] - slope) < 1e-4


def test_retention_rate_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_retention_rate,
    )

    out = t_retention_rate(SF).set_index(["cohort_week", "age"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev["w"] = ev["ts"].astype("datetime64[us]").astype(np.int64) // WEEK_US
    s = ev[ev["event_type"] == "signup"].groupby("user_id")["w"].min()
    from collections import Counter, defaultdict
    cohort_size = Counter(s.values)
    cells = defaultdict(set)
    for u, w in zip(ev["user_id"], ev["w"]):
        if u in s.index and w >= s[u]:
            cells[(int(s[u]), int(w - s[u]))].add(u)
    assert len(out) == len(cells)
    for (ws, age), users in cells.items():
        r = out.loc[(ws, age)]
        assert r["active_users"] == len(users)
        assert r["cohort_size"] == cohort_size[ws]
        assert abs(r["retention"] - len(users) / cohort_size[ws]) < 2e-6
    # age-0 retention is 1.0 by construction (the signup itself counts)
    age0 = out.reset_index()
    age0 = age0[age0["age"] == 0]
    assert (np.abs(age0["retention"].to_numpy() - 1.0) < 1e-9).all()


def test_completeness_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_completeness_audit,
    )

    out = d_completeness_audit(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    isnull = docs["text"].isna()
    empty = (~isnull) & (docs["text"] == "")
    wsonly = (~isnull) & docs["text"].str.fullmatch(r"\s+").fillna(False)
    n = len(docs)
    assert out["rows"].iloc[0] == n
    assert out["null_text"].iloc[0] == int(isnull.sum())
    assert out["empty_text"].iloc[0] == int(empty.sum())
    assert out["ws_only_text"].iloc[0] == int(wsonly.sum())
    assert out["null_lang"].iloc[0] == int(docs["lang"].isna().sum())
    assert out["dup_doc_ids"].iloc[0] == n - docs["doc_id"].nunique()
    bad = int(isnull.sum() + empty.sum() + wsonly.sum())
    assert abs(out["usable_rate"].iloc[0] - (n - bad) / n) < 2e-6
