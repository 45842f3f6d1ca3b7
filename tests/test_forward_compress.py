"""t_forward_window / q_percentile_exact / d_compress_ratio vs brute force."""

import zlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_forward_window_bruteforce_and_no_leakage(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_forward_window,
    )

    out = t_forward_window(SF).set_index("event_id")
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    HOUR = pd.Timedelta(hours=1)
    for uid, g in list(ev.groupby("user_id"))[:20]:
        g = g.sort_values("ts")
        for _, r in g.iterrows():
            inw = g[(g["ts"] >= r["ts"] + HOUR) & (g["ts"] <= r["ts"] + 7 * 24 * HOUR)]
            row = out.loc[r["event_id"]]
            assert row["fwd_n"] == len(inw)
            assert abs(row["fwd_sum"] - inw["value"].sum()) < 2e-6
            # embargo: nothing within the first hour after t ever counts
            close = g[(g["ts"] > r["ts"]) & (g["ts"] < r["ts"] + HOUR)]
            if len(close) and len(inw) == 0:
                assert row["fwd_n"] == 0


def test_percentile_exact_is_input_element(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_percentile_exact,
    )

    out = q_percentile_exact(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    )
    li["grp"] = li["l_returnflag"] + "|" + li["l_linestatus"]
    for _, r in out.iterrows():
        vals = np.sort(li.loc[li["grp"] == r["grp"], "l_extendedprice"].to_numpy())
        n = len(vals)
        assert r["p50"] == vals[int(np.ceil(n / 2)) - 1]
        assert r["p90"] == vals[int(np.ceil(9 * n / 10)) - 1]
        # bit-exact element of the input, no interpolation
        assert r["p50"] in vals and r["p90"] in vals


def test_compress_ratio_matches_zlib_and_orders_repetition(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_compress_ratio,
    )

    out = d_compress_ratio(SF).to_pandas().set_index("doc_id")
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for _, r in doc.head(30).iterrows():
        b = (r["text"] or "").encode("utf-8")
        row = out.loc[r["doc_id"]]
        assert row["raw_bytes"] == len(b)
        assert row["comp_bytes"] == len(zlib.compress(b, 6))
        if len(b):
            assert abs(row["ratio"] - len(zlib.compress(b, 6)) / len(b)) < 2e-6
    # repetitive text compresses much better than varied text
    rep = ("spam " * 500).encode()
    var = " ".join(f"w{i}x{i * 7 % 101}" for i in range(500)).encode()
    assert len(zlib.compress(rep, 6)) / len(rep) < len(zlib.compress(var, 6)) / len(var)
