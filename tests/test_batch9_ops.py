"""Grouping sets / pct-change / degree histogram / calibration / hinge
basis vs brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_grouping_sets_matches_pandas(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_grouping_sets

    out = q_grouping_sets(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    orders["c"] = np.floor(orders["o_totalprice"].to_numpy(np.float64) * 100 + 0.5)
    orders["o_year"] = orders["o_orderdate"].dt.year.astype(np.float64)
    n_dims = (orders["o_orderpriority"].nunique()
              + orders["o_orderstatus"].nunique()
              + orders["o_year"].nunique())
    assert len(out) == n_dims
    # spot-check the priority set
    prio = out[out["o_orderpriority"].notna()].set_index("o_orderpriority")
    ref = orders.groupby("o_orderpriority").agg(n=("c", "size"), s=("c", "sum"))
    for p, r in ref.iterrows():
        assert int(prio.loc[p, "n"]) == int(r["n"])
        assert abs(prio.loc[p, "sum_total"] - r["s"] / 100.0) < 1e-9
        assert np.isnan(prio.loc[p, "o_year"]) and prio.loc[p, "o_orderstatus"] is None
    # year set rows carry NULL string dims
    yr = out[out["o_year"].notna()]
    assert yr["o_orderpriority"].isna().all()
    assert int(yr["n"].sum()) == len(orders)


def test_pct_change_matches_pandas(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_pct_change

    out = t_pct_change(SF).to_pandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["c"] = np.floor(ev["value"].to_numpy(np.float64) * 100 + 0.5)
    ref = ev.groupby("user_id")["c"].pct_change().dropna()
    assert len(out) == len(ref)
    exp = pd.Series(ref.to_numpy(), index=ev.loc[ref.index, "event_id"].to_numpy())
    joined = out["pct_change"].reindex(exp.index)
    assert np.allclose(joined.to_numpy(), exp.to_numpy(), atol=2e-6)


def test_degree_stats_matches_pandas(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_degree_stats

    out = d_degree_stats(SF).set_index("degree")["n_suppliers"]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    deg = li.drop_duplicates().groupby("l_suppkey").size()
    ref = deg.value_counts().sort_index()
    assert out.to_dict() == {int(k): int(v) for k, v in ref.items()}


def test_calibration_bins_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_calibration

    out = d_calibration(SF).set_index("bin")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["n_chars", "lang"])
    v = docs["n_chars"].to_numpy(np.int64)
    lo, hi = int(v.min()), int(v.max())
    span = max(hi - lo, 1)
    b = np.minimum((v - lo) * 10 // span, 9)
    pos = (docs["lang"] == "en").to_numpy()
    for k in np.unique(b):
        m = b == k
        assert int(out.loc[k, "n"]) == int(m.sum())
        assert abs(out.loc[k, "mean_label"] - pos[m].mean()) < 2e-6
        norm = (v[m] - lo) / span
        assert abs(out.loc[k, "mean_score"] - norm.mean()) < 2e-6
    assert int(out["n"].sum()) == len(docs)


def test_hinge_basis_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_hinge

    out = fe_hinge(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity"])
    # the synthetic (orderkey, linenumber) key is non-unique: compare
    # sorted multisets of full rows instead of a key merge
    q = li["l_quantity"].to_numpy()
    exp = pd.DataFrame({
        "l_orderkey": li["l_orderkey"], "l_linenumber": li["l_linenumber"],
        **{f"h_pos_{k}": np.maximum(q - k, 0.0) for k in (10, 25, 40)},
        **{f"h_neg_{k}": np.maximum(k - q, 0.0) for k in (10, 25, 40)},
    })
    cols = sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # hinge pair reconstructs the identity: h_pos − h_neg = x − knot
    assert np.allclose(b["h_pos_25"] - b["h_neg_25"],
                       b["h_pos_10"] - b["h_neg_10"] - 15.0)
