"""Kaplan-Meier / weighted median / containment / interval join vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_km_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_km

    out = t_km(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev = ev.assign(t=ev["ts"].to_numpy("datetime64[us]").astype(np.int64))
    t_end = int(ev["t"].max())
    signups = ev[ev["event_type"] == "signup"].groupby("user_id")["t"].min()
    durs, evs = [], []
    for uid, t0 in signups.items():
        later = ev[(ev["user_id"] == uid) & (ev["event_type"] == "purchase")
                   & (ev["t"] >= t0)]
        if len(later):
            durs.append(int(later["t"].min() - t0)); evs.append(True)
        else:
            durs.append(t_end - t0); evs.append(False)
    durs, evs = np.array(durs), np.array(evs)
    # reference KM product-limit estimator
    s = 1.0
    ref = {}
    for t in np.unique(durs[evs]):
        n = int((durs >= t).sum())
        d = int(((durs == t) & evs).sum())
        s *= (n - d) / n
        ref[t] = s
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        t = int(row["duration_us"])
        assert abs(row["survival"] - ref[t]) < 5e-5
        assert int(row["n_risk"]) == int((durs >= t).sum())
        assert int(row["d_events"]) == int(((durs == t) & evs).sum())
    # survival is monotone non-increasing from ~1
    sv = out["survival"].to_numpy()
    assert (np.diff(sv) <= 1e-9).all()
    assert sv[0] <= 1.0 + 1e-6 and sv[-1] >= -1e-9


def test_weighted_median_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_weighted_median,
    )

    out = q_weighted_median(SF).set_index(["l_returnflag", "l_linestatus"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_extendedprice", "l_quantity"])
    li = li.assign(
        v=np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64),
        w=li["l_quantity"].to_numpy().astype(np.int64),
    )
    for (f, s), g in li.groupby(["l_returnflag", "l_linestatus"]):
        g = g.sort_values("v")
        W = int(g["w"].sum())
        cw = g["w"].cumsum().to_numpy()
        pick = int(g["v"].to_numpy()[np.argmax(2 * cw >= W)])
        assert int(out.loc[(f, s), "wmedian_cents"]) == pick
        assert int(out.loc[(f, s), "total_qty"]) == W
        # weighted median lies within the group's value range
        assert g["v"].min() <= pick <= g["v"].max()


def test_containment_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_containment,
    )

    out = d_containment(SF).to_pandas().set_index("a_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")

    def grams(t):
        ws = (t or "").split()
        return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}

    n_checked = 0
    for a_id, row in out.iterrows():
        ga = grams(docs.loc[a_id, "text"])
        gb = grams(docs.loc[int(row["b_id"]), "text"])
        inter = len(ga & gb)
        exp_ab = 1.0 if not ga else inter / len(ga)
        exp_ba = 1.0 if not gb else inter / len(gb)
        assert abs(row["a_in_b"] - exp_ab) < 5e-6
        assert abs(row["b_in_a"] - exp_ba) < 5e-6
        assert 0.0 <= row["a_in_b"] <= 1.0 + 1e-9
        n_checked += 1
    assert n_checked >= 5


def test_interval_join_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_interval_join,
    )

    out = q_interval_join(SF).to_pandas()
    out = out.sort_values(["o_custkey", "a_key", "b_key"]).reset_index(drop=True)
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    ends = li.assign(
        e=li["l_shipdate"].to_numpy("datetime64[us]").astype(np.int64)
    ).groupby("l_orderkey")["e"].max()
    iv = orders.assign(
        s=orders["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
    ).merge(ends.rename("e").reset_index(),
            left_on="o_orderkey", right_on="l_orderkey")
    exp = []
    for cust, g in iv.groupby("o_custkey"):
        g = g.sort_values("o_orderkey")
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                a, b = g.iloc[i], g.iloc[j]
                if a["s"] <= b["e"] and b["s"] <= a["e"]:
                    exp.append((cust, int(a["o_orderkey"]), int(b["o_orderkey"]),
                                int(min(a["e"], b["e"]) - max(a["s"], b["s"]))))
    exp = pd.DataFrame(exp, columns=["o_custkey", "a_key", "b_key",
                                     "overlap_us"])
    exp = exp.sort_values(["o_custkey", "a_key", "b_key"]).reset_index(drop=True)
    assert len(out) == len(exp) > 0
    pd.testing.assert_frame_equal(
        out[["o_custkey", "a_key", "b_key", "overlap_us"]].astype(np.int64),
        exp.astype(np.int64),
    )
