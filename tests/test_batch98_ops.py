"""Batch 98: regional price-parity index, month-end discount pacing,
mojibake/encoding-artifact census."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_regional_price_parity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_regional_price_parity,
    )

    out = q_regional_price_parity(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey",
                                  "l_quantity", "l_extendedprice"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_custkey"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet",
                         columns=["n_nationkey", "n_regionkey"])
    re = pd.read_parquet(f"{SF}/region.parquet",
                         columns=["r_regionkey", "r_name"])
    li["qy"] = np.floor(li["l_quantity"].to_numpy() + 0.5) \
        .astype(np.int64)
    li["c"] = np.floor(li["l_extendedprice"].to_numpy() * 100
                       + 0.5).astype(np.int64)
    gp = li.groupby("l_partkey").agg(
        qg=("qy", "sum"), cg=("c", "sum"))
    li["base"] = [
        (int(q) * int(gp.loc[p, "cg"])) // int(gp.loc[p, "qg"])
        for q, p in zip(li["qy"], li["l_partkey"])]
    j = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey")
         .merge(re, left_on="n_regionkey", right_on="r_regionkey"))
    exp = j.groupby("r_name").agg(
        n=("c", "size"), act=("c", "sum"), base=("base", "sum"))
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        e = exp.loc[row["r_name"]]
        assert row["n_lines"] == e["n"]
        assert int(row["actual_cents"]) == int(e["act"])
        assert int(row["baseline_cents"]) == int(e["base"])
        assert abs(row["parity_index"]
                   - int(e["act"]) / int(e["base"])) < 2e-6


def test_discount_pacing_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_discount_pacing,
    )

    out = q_discount_pacing(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_shipdate", "l_discount"])
    s = li["l_shipdate"]
    eom = (s.dt.day > s.dt.days_in_month - 3).to_numpy()
    d = np.floor(li["l_discount"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    de, dr = d[eom], d[~eom]
    row = out.iloc[0]
    assert row["n_end"] == len(de)
    assert row["n_rest"] == len(dr)
    assert abs(row["mean_dbp_end"] - de.mean()) < 1e-4
    assert abs(row["mean_dbp_rest"] - dr.mean()) < 1e-4
    ve = de.var()
    vr = dr.var()
    z = (de.mean() - dr.mean()) / np.sqrt(ve / len(de) + vr / len(dr))
    assert abs(row["welch_z"] - z) < 1e-4


def test_mojibake_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_mojibake,
    )

    out = d_mojibake(SF)
    dc = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    txt = dc["text"].fillna("")
    txt = txt.where(dc["doc_id"] % 37 != 0, txt + " broken�token")
    txt = txt.where(dc["doc_id"] % 41 != 0,
                    txt + " â€œquotedâ€ text")
    repl = txt.str.contains("�", regex=False)
    moji = txt.str.contains("â€", regex=False)
    exp = pd.DataFrame({
        "source": dc["source"], "repl": repl, "moji": moji,
        "aff": repl | moji,
    }).groupby("source").agg(
        n=("repl", "size"), repl=("repl", "sum"),
        moji=("moji", "sum"), aff=("aff", "sum"))
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        e = exp.loc[row["source"]]
        assert row["n_docs"] == e["n"]
        assert row["n_replacement_char"] == e["repl"]
        assert row["n_mojibake"] == e["moji"]
        assert abs(row["affected_share"] - e["aff"] / e["n"]) < 2e-6
