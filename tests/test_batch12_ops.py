"""NULL-safe join / RBF basis / lang-ID F1 / dwell time vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_null_safe_join_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_null_safe_join

    out = q_null_safe_join(SF).set_index("null_group")
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    ok = orders["o_custkey"].to_numpy(np.int64)
    cents = np.floor(orders["o_totalprice"].to_numpy(np.float64) * 100 + 0.5)
    ck = cust["c_custkey"].to_numpy(np.int64)
    o_null, c_null = ok % 500 == 0, ck % 500 == 0
    n_nc = int(c_null.sum())
    # null group: cartesian of both sides' NULL rows
    if o_null.sum() * n_nc:
        assert int(out.loc[True, "n_pairs"]) == int(o_null.sum()) * n_nc
        assert abs(out.loc[True, "sum_total"]
                   - cents[o_null].sum() * n_nc / 100.0) < 1e-9
    else:
        assert True not in out.index
    keyed = pd.Series(ck[~c_null]).value_counts()
    m = pd.Series(ok[~o_null]).map(keyed).fillna(0).to_numpy(np.int64)
    assert int(out.loc[False, "n_pairs"]) == int(m.sum())
    assert abs(out.loc[False, "sum_total"]
               - (cents[~o_null] * m).sum() / 100.0) < 1e-9


def test_rbf_matches_numpy(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_rbf

    out = fe_rbf(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"])
    # multiset comparison on the value columns (non-unique key)
    q = np.sort(li["l_quantity"].to_numpy(np.float64))
    for c in (10, 25, 40):
        exp = np.sort(np.exp(-0.005 * (q - c) ** 2))
        got = np.sort(out[f"rbf_{c}"].to_numpy())
        assert np.allclose(got, exp, atol=2e-6)
    # peak at the center, decaying away from it
    assert out["rbf_25"].max() <= 1.0
    mid = li["l_quantity"].sub(25).abs().idxmin()
    assert np.exp(-0.005 * (li.loc[mid, "l_quantity"] - 25) ** 2) >= \
        out["rbf_25"].mean()


def test_lang_f1_matches_confusion(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lang_confusion,
        d_lang_f1,
    )

    conf = d_lang_confusion(SF)
    out = d_lang_f1(SF).set_index("lang")
    true_n = conf.groupby("lang")["n"].sum()
    pred_n = conf.groupby("lang_pred")["n"].sum()
    tp = conf[conf["lang"] == conf["lang_pred"]].set_index("lang")["n"]
    assert set(out.index) == set(true_n.index)
    for lang in true_n.index:
        t, p = int(true_n[lang]), int(pred_n.get(lang, 0))
        h = int(tp.get(lang, 0))
        assert int(out.loc[lang, "true_n"]) == t
        assert int(out.loc[lang, "pred_n"]) == p
        assert int(out.loc[lang, "tp"]) == h
        assert abs(out.loc[lang, "rec"] - h / t) < 2e-6
        if p == 0:
            assert np.isnan(out.loc[lang, "prec"])
        else:
            assert abs(out.loc[lang, "prec"] - h / p) < 2e-6
            pr, rc = h / p, h / t
            if pr + rc > 0:
                assert abs(out.loc[lang, "f1"] - 2 * pr * rc / (pr + rc)) < 4e-6


def test_dwell_time_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_dwell_time

    out = t_dwell_time(SF).set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    us = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    u = ev["user_id"].to_numpy(np.int64)
    et = ev["event_type"].to_numpy(object)
    same = u[1:] == u[:-1]
    df = pd.DataFrame({"t": et[:-1][same], "dt": us[1:][same] - us[:-1][same]})
    ref = df.groupby("t")["dt"].agg(["sum", "count"])
    assert set(out.index) == set(ref.index)
    for t, r in ref.iterrows():
        assert int(out.loc[t, "total_us"]) == int(r["sum"])
        assert int(out.loc[t, "n_intervals"]) == int(r["count"])
        assert abs(out.loc[t, "mean_us"] - r["sum"] / r["count"]) < 1e-3
