"""AUC / autocorrelation / count+LOO encodings / CUSUM vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_auc_matches_bruteforce_pairs(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_auc

    out = d_auc(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars", "lang"])
    for src, g in docs.groupby("source"):
        pos = g.loc[g["lang"] == "en", "n_chars"].to_numpy(np.float64)
        neg = g.loc[g["lang"] != "en", "n_chars"].to_numpy(np.float64)
        if len(pos) == 0 or len(neg) == 0:
            assert src not in out.index
            continue
        # O(np*nn) pairwise definition: P(pos > neg) + 0.5 P(pos == neg)
        diff = pos[:, None] - neg[None, :]
        auc = ((diff > 0).sum() + 0.5 * (diff == 0).sum()) / (len(pos) * len(neg))
        row = out.loc[src]
        assert int(row["n_pos"]) == len(pos) and int(row["n_neg"]) == len(neg)
        assert abs(row["auc"] - auc) < 2e-6


def test_autocorr_matches_numpy_corrcoef(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_autocorr

    out = t_autocorr(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for uid, g in ev.groupby("user_id"):
        v = np.floor(g["value"].to_numpy(np.float64) * 100 + 0.5)
        if len(v) < 3:
            continue
        x, y = v[:-1], v[1:]
        if x.std() == 0 or y.std() == 0:
            assert uid not in out.index
            continue
        r = np.corrcoef(x, y)[0, 1]
        assert abs(out.loc[uid, "autocorr"] - r) < 2e-6
        assert int(out.loc[uid, "n_pairs"]) == len(x)
        checked += 1
    assert checked >= 5


def test_count_and_loo_encodings(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        fe_count_encode,
        fe_loo_encode,
    )

    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cnt = fe_count_encode(SF).to_pandas().set_index("o_orderkey")
    vc = orders["o_orderpriority"].value_counts()
    for _, row in orders.sample(20, random_state=0).iterrows():
        k = row["o_orderkey"]
        assert int(cnt.loc[k, "cat_n"]) == int(vc[row["o_orderpriority"]])
        assert abs(cnt.loc[k, "cat_freq"]
                   - vc[row["o_orderpriority"]] / len(orders)) < 2e-6

    loo = fe_loo_encode(SF).to_pandas().set_index("o_orderkey")
    cents = np.floor(orders["o_totalprice"].to_numpy(np.float64) * 100 + 0.5)
    orders = orders.assign(c=cents)
    s = orders.groupby("o_orderpriority")["c"].transform("sum")
    n = orders.groupby("o_orderpriority")["c"].transform("count")
    expect = ((s - orders["c"]) / 100.0) / (n - 1)
    joined = loo.join(orders.set_index("o_orderkey")[[]].assign(exp=expect.to_numpy()))
    assert len(loo) == (n > 1).sum()
    assert np.allclose(joined["loo_mean"], joined["exp"], atol=2e-6)


def test_cusum_matches_recursive_definition(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_cusum

    out = t_cusum(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    cents = np.floor(ev["value"].to_numpy(np.float64) * 100 + 0.5).astype(int)
    n_total, s_total = len(cents), int(cents.sum())
    ev = ev.assign(c=cents)
    checked = 0
    for uid, g in ev.groupby("user_id"):
        # Page's recursive CUSUM in the engine's exact scaled-integer
        # space (dev = n·c − Σc), so alarm counts compare EXACTLY even
        # when a user lands on the 50.0 threshold boundary
        s, mx, alarms = 0, 0, 0
        for c in g["c"]:
            s = max(0, s + (n_total * int(c) - s_total))
            mx = max(mx, s)
            alarms += s > 5000 * n_total
        row = out.loc[uid]
        assert abs(row["max_cusum"] - mx / (100.0 * n_total)) < 2e-6
        assert int(row["n_alarms"]) == alarms
        checked += 1
    assert checked >= 5


def test_cusum_detects_injected_shift(ray_session):
    """A deterministic +200 shift on one user's tail must raise that
    user's max CUSUM far above the un-shifted population."""
    import duckdb

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        QUERIES,
    )

    fn, sql = QUERIES["t_cusum"]
    out = fn(SF).to_pandas()
    base = out["max_cusum"].max()

    ev = pd.read_parquet(f"{SF}/events.parquet")
    uid = int(ev["user_id"].iloc[0])
    mask = ev["user_id"] == uid
    tail = ev.index[mask][len(ev.index[mask]) // 2:]
    ev.loc[tail, "value"] = ev.loc[tail, "value"] + 200.0
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        ev.to_parquet(os.path.join(td, "events.parquet"), index=False)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(td, 'events.parquet')}')"
        )
        shifted = con.execute(sql).fetchdf().set_index("user_id")
    assert shifted.loc[uid, "max_cusum"] > base
    assert shifted.loc[uid, "n_alarms"] >= 1
