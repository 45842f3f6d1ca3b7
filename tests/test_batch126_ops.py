"""Batch 126: embedding sparsity census, part popularity ladder,
supplier-vs-customer balance gap."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_embed_sparsity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_embed_sparsity,
    )

    out = d_embed_sparsity(SF)
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    am = np.floor(np.abs(emb) * 1e6 + 0.5005).astype(np.int64)
    sp = am < 10_000
    h = sp.sum(axis=1)
    d = emb.shape[1]
    b = np.minimum(9, (10 * h) // d)
    exp = pd.Series(b).value_counts().sort_index()
    assert list(out["bucket"]) == list(exp.index)
    for _, row in out.iterrows():
        assert row["n_vecs"] == exp[int(row["bucket"])]
    assert abs(out.iloc[0]["sparse_component_share"]
               - sp.mean()) < 2e-6


def test_part_popularity_hist_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_part_popularity_hist,
    )

    out = q_part_popularity_hist(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_partkey"])
    pt = pd.read_parquet(f"{SF}/part.parquet",
                         columns=["p_partkey"])
    cnt = li.groupby("l_partkey").size()
    b = np.floor(np.log2(cnt.to_numpy(float))).astype(int)
    g = pd.DataFrame({"b": b, "n": cnt.to_numpy()})
    agg = g.groupby("b").agg(parts=("n", "size"),
                             lines=("n", "sum"))
    zero = len(pt) - len(cnt)
    tot = int(cnt.sum())
    rows = list(out.itertuples(index=False))
    i = 0
    if zero > 0:
        assert rows[0].bucket_log2 == -1
        assert rows[0].n_parts == zero
        assert rows[0].n_lines == 0
        i = 1
    for bb, e in agg.iterrows():
        r = rows[i]
        assert r.bucket_log2 == bb
        assert r.n_parts == e["parts"]
        assert r.n_lines == e["lines"]
        assert abs(r.line_share - e["lines"] / tot) < 2e-6
        i += 1
    assert i == len(rows)


def test_balance_book_gap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_balance_book_gap,
    )

    out = q_balance_book_gap(SF)
    su = pd.read_parquet(f"{SF}/supplier.parquet",
                         columns=["s_acctbal"])
    cu = pd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_acctbal"])
    a = np.floor(su["s_acctbal"] * 100 + 0.5).astype(int) \
        .to_numpy(float)
    b = np.floor(cu["c_acctbal"] * 100 + 0.5).astype(int) \
        .to_numpy(float)
    t = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    row = out.iloc[0]
    assert row["n_suppliers"] == len(a)
    assert row["n_customers"] == len(b)
    assert abs(row["mean_supplier_cents"] - a.mean()) < 2e-6
    assert abs(row["mean_customer_cents"] - b.mean()) < 2e-6
    assert abs(row["welch_t"] - t) < 2e-5
