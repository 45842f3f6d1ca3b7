"""Batch 153: doubled-word census, session-exit census, nation
discount bias."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_doubled_word_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_doubled_word_census,
    )

    out = d_doubled_word_census(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    from collections import Counter
    dbl = Counter()
    n_docs = n_aff = n_pairs = 0
    for t in docs["text"].fillna(""):
        ws = t.split()
        if not ws:
            continue
        n_docs += 1
        n_pairs += len(ws) - 1
        hits = [b for a, b in zip(ws, ws[1:]) if a == b]
        if hits:
            n_aff += 1
            dbl.update(hits)
    n_dbl = sum(dbl.values())
    exp = sorted(dbl.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert len(out) == len(exp)
    for i, (tok, c) in enumerate(exp):
        row = out.iloc[i]
        assert row["token"] == tok
        assert row["n_doublings"] == c
    assert abs(out.iloc[0]["affected_doc_share"]
               - n_aff / n_docs) < 2e-6
    assert abs(out.iloc[0]["doublings_per_10k"]
               - n_dbl * 10_000 / n_pairs) < 2e-4


def test_session_exit_census(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_session_exit_census,
    )

    out = t_session_exit_census(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    u = ev["user_id"].to_numpy()
    t = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    et = ev["event_type"].to_numpy(object)
    last = np.ones(len(ev), bool)
    same = u[1:] == u[:-1]
    last[:-1][same & (t[1:] - t[:-1]
                      <= 30 * 60 * 1_000_000)] = False
    df = pd.DataFrame({"et": et, "ends": last.astype(int)})
    g = df.groupby("et")["ends"].agg(["size", "sum"])
    E, N = df["ends"].sum(), len(df)
    assert list(out["event_type"]) == sorted(g.index)
    for _, row in out.iterrows():
        e = g.loc[row["event_type"]]
        assert row["n_events"] == e["size"]
        assert row["n_session_ends"] == e["sum"]
        assert abs(row["exit_share"] - e["sum"] / E) < 2e-6
        assert abs(row["exit_lift"]
                   - (e["sum"] / e["size"]) / (E / N)) < 2e-5


def test_nation_discount_bias(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_nation_discount_bias,
    )

    out = q_nation_discount_bias(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_discount"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet")
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey"))
    j["bp"] = np.floor(j["l_discount"] * 100 + 0.5).astype(int)
    g = j.groupby("c_nationkey")["bp"].agg(["size", "mean"])
    gm = j["bp"].mean()
    nmap = dict(zip(na["n_nationkey"], na["n_name"]))
    assert set(out["n_name"]) == {nmap[k] for k in g.index}
    for _, row in out.iterrows():
        nk = [k for k, v in nmap.items()
              if v == row["n_name"]][0]
        e = g.loc[nk]
        assert row["n_lines"] == e["size"]
        assert abs(row["mean_discount_bp"] - e["mean"]) < 2e-6
        assert abs(row["discount_lift"] - e["mean"] / gm) < 2e-5
