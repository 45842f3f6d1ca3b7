"""t_resample / d_ks_test / d_gini / d_sentence_stats vs brute force."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_resample_linear_interpolation_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_resample

    out = t_resample(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    STEP = 21_600_000_000
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.groupby("ts", as_index=False)["value"].mean().sort_values("ts")
        t = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        v = g["value"].to_numpy(np.float64)
        start = -(-t[0] // STEP) * STEP
        for gp in range(start, t[-1] + 1, STEP):
            # np.interp IS linear interpolation with exact endpoints
            rows.append((uid, gp, float(np.interp(gp, t, v))))
    exp = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    exp = exp.sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert len(out) == len(exp)
    pd.testing.assert_frame_equal(
        out[["user_id", "ts"]], exp[["user_id", "ts"]], check_dtype=False
    )
    np.testing.assert_allclose(
        out["value"].to_numpy(), exp["value"].to_numpy(), atol=2e-6
    )
    # grid points that land exactly on an event reproduce its value
    ev_idx = ev.set_index(["user_id", "ts"])["value"]
    hits = out.set_index(["user_id", "ts"]).index.intersection(ev_idx.index)
    if len(hits):
        got = out.set_index(["user_id", "ts"]).loc[hits, "value"]
        np.testing.assert_allclose(got, ev_idx.loc[hits], atol=2e-6)


def test_ks_statistic_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_ks_test

    out = d_ks_test(SF)
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    a = np.sort(doc.loc[doc["lang"] == "en", "n_chars"].to_numpy())
    b = np.sort(doc.loc[doc["lang"] != "en", "n_chars"].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    ks = np.max(np.abs(fa - fb))
    assert int(out.loc[0, "n_en"]) == len(a)
    assert int(out.loc[0, "n_other"]) == len(b)
    assert abs(out.loc[0, "ks"] - ks) < 2e-6


def test_gini_bruteforce_and_bounds(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_gini

    out = d_gini(SF).set_index("source")
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["source", "n_chars"])
    for src, g in doc.groupby("source"):
        x = np.sort(g["n_chars"].to_numpy(np.float64))
        n = len(x)
        ref = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
        assert abs(out.loc[src, "gini"] - ref) < 2e-6
        assert -1e-9 <= out.loc[src, "gini"] < 1
    # a constant column has Gini 0; a single huge doc pushes it toward 1
    xs = np.array([5.0, 5, 5, 5])
    assert abs(2 * np.sum(np.arange(1, 5) * xs) / (4 * xs.sum()) - 5 / 4) < 1e-12


def test_sentence_stats_hand_computed(ray_session):
    import pyarrow as pa

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_sentence_stats,
    )

    out = d_sentence_stats(SF).to_pandas()
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    import re

    for _, r in doc.head(50).iterrows():
        segs = re.split(r"[.!?]+", r["text"] or "")
        n_sent = sum(1 for s in segs if re.search(r"\S", s))
        words = len(re.findall(r"\S+", r["text"] or ""))
        row = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_sent"] == n_sent
        assert row["n_words"] == words
        if n_sent:
            assert abs(row["mean_sent_words"] - words / n_sent) < 2e-6
        else:
            assert pd.isna(row["mean_sent_words"])
