"""RFM segmentation / time split / Pythagorean means / vocab overlap vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rfm_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_rfm

    out = t_rfm(SF).set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type", "value"])
    t = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    t_end = int(t.max())
    p = ev[ev["event_type"] == "purchase"].assign(
        t=t[ev["event_type"].to_numpy() == "purchase"],
        cents=np.floor(ev.loc[ev["event_type"] == "purchase", "value"]
                       .to_numpy() * 100 + 0.5).astype(np.int64))
    agg = p.groupby("user_id").agg(f=("t", "size"), m=("cents", "sum"),
                                   last=("t", "max"))
    agg["r"] = t_end - agg["last"]
    assert set(out.index) == set(agg.index)
    for uid, row in agg.iterrows():
        assert int(out.loc[uid, "f"]) == row["f"]
        assert int(out.loc[uid, "m_cents"]) == row["m"]
        assert int(out.loc[uid, "r_us"]) == row["r"]

    # NTILE exactness: reproduce via sorted positions
    def ntile(vals, ids):
        order = np.lexsort((ids, vals))
        n = len(ids)
        q, rem = divmod(n, 5)
        b = np.empty(n, np.int64)
        for pos, j in enumerate(order):
            b[j] = (pos // (q + 1) if pos < rem * (q + 1)
                    else rem + (pos - rem * (q + 1)) // q) + 1
        return b

    ids = agg.index.to_numpy(np.int64)
    for col, score in (("r", "r_score"), ("f", "f_score"), ("m", "m_score")):
        exp = ntile(agg[col].to_numpy(np.int64), ids)
        got = out.loc[agg.index, score].to_numpy(np.int64)
        assert (exp == got).all()
    # every score bucket is within 1 of n/5 in size
    for score in ("r_score", "f_score", "m_score"):
        sizes = out[score].value_counts()
        assert sizes.max() - sizes.min() <= 1


def test_time_split_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_time_split,
    )

    out = t_time_split(SF).set_index("split")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_id"])
    t = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    order = np.lexsort((ev["event_id"].to_numpy(np.int64), t))
    ts_sorted = t[order]
    n = len(t)
    k_train, k_val = n * 70 // 100, n * 85 // 100
    assert int(out.loc["train", "n_rows"]) == k_train
    assert int(out.loc["val", "n_rows"]) == k_val - k_train
    assert int(out.loc["test", "n_rows"]) == n - k_val
    assert int(out.loc["train", "min_us"]) == ts_sorted[0]
    assert int(out.loc["train", "max_us"]) == ts_sorted[k_train - 1]
    assert int(out.loc["val", "min_us"]) == ts_sorted[k_train]
    assert int(out.loc["val", "max_us"]) == ts_sorted[k_val - 1]
    assert int(out.loc["test", "min_us"]) == ts_sorted[k_val]
    assert int(out.loc["test", "max_us"]) == ts_sorted[-1]
    # temporal discipline: train ends no later than val starts, etc.
    assert out.loc["train", "max_us"] <= out.loc["val", "min_us"]
    assert out.loc["val", "max_us"] <= out.loc["test", "min_us"]


def test_pythagorean_means_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_pythagorean_means,
    )

    out = q_pythagorean_means(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    for src, g in docs.groupby("source"):
        v = g["n_chars"].to_numpy(np.float64)
        am = v.mean()
        gm = np.exp(np.log(v).mean())
        hm = len(v) / (1.0 / v).sum()
        assert abs(out.loc[src, "am"] - am) < 5e-6
        assert abs(out.loc[src, "gm"] - gm) < 5e-3  # micro-floored ln terms
        assert abs(out.loc[src, "hm"] - hm) < 5e-4
        # AM >= GM >= HM (Jensen), with quantization slack
        assert out.loc[src, "am"] >= out.loc[src, "gm"] - 1e-5
        assert out.loc[src, "gm"] >= out.loc[src, "hm"] - 1e-5


def test_vocab_overlap_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_vocab_overlap,
    )

    out = d_vocab_overlap(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    sets = {}
    for src, g in docs.groupby("source"):
        toks = set()
        for t in g["text"]:
            toks.update((t or "").split())
        sets[src] = toks
    seen = 0
    for _, row in out.iterrows():
        a, b = sets[row["src_a"]], sets[row["src_b"]]
        inter = len(a & b)
        assert int(row["va"]) == len(a) and int(row["vb"]) == len(b)
        assert int(row["inter"]) == inter
        assert abs(row["jaccard"] - inter / len(a | b)) < 5e-6
        seen += 1
    # every non-disjoint pair appears exactly once with src_a < src_b
    exp_pairs = {(a, b) for a in sets for b in sets
                 if a < b and sets[a] & sets[b]}
    assert seen == len(exp_pairs)
    assert (out["src_a"] < out["src_b"]).all()
