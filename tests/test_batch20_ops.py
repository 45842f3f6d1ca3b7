"""Nelson-Aalen / diff-in-differences / spline basis / trimmed mean vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _surv_reference():
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
    return np.array(durs), np.array(evs)


def test_nelson_aalen_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_nelson_aalen,
    )

    out = t_nelson_aalen(SF)
    durs, evs = _surv_reference()
    h = 0.0
    ref = {}
    for t in np.unique(durs[evs]):
        n = int((durs >= t).sum())
        d = int(((durs == t) & evs).sum())
        h += d / n
        ref[t] = (n, d, h)
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        n, d, h = ref[int(row["duration_us"])]
        assert int(row["n_risk"]) == n and int(row["d_events"]) == d
        assert abs(row["cum_hazard"] - h) < 5e-5
    # cumulative hazard is monotone non-decreasing
    assert (np.diff(out["cum_hazard"].to_numpy()) >= -1e-12).all()


def test_did_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_did

    out = t_did(SF).iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    t = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    mid = (int(t.min()) + int(t.max())) // 2
    treat = ev["user_id"].to_numpy() % 2 == 1
    post = t >= mid
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5)
    means = {}
    for tr in (False, True):
        for po in (False, True):
            m = cents[treat == tr][post[treat == tr] == po]
            key = f"{'t' if tr else 'c'}{int(po)}"
            means[key] = m.mean() / 100
            assert int(out[f"n_{key}"]) == len(m)
            assert abs(out[f"m_{key}"] - means[key]) < 5e-6
    did = (means["t1"] - means["t0"]) - (means["c1"] - means["c0"])
    assert abs(out["did"] - did) < 2e-5


def test_spline_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import fe_spline

    out = fe_spline(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_quantity"])
    assert len(out) == len(li)
    # the fixture's (orderkey, linenumber) pairs are NOT unique, so
    # validate row-locally against the output's own x column plus a
    # multiset check on x itself
    assert (np.sort(out["x"].to_numpy())
            == np.sort(li["l_quantity"].to_numpy())).all()
    x = out["x"].to_numpy()
    assert (out["x2"].to_numpy() == x * x).all()
    assert (out["x3"].to_numpy() == x ** 3).all()
    for k in (15, 30, 45):
        d = np.maximum(x - k, 0.0)
        assert (out[f"spl_{k}"].to_numpy() == d ** 3).all()
    # basis continuity: spline term is zero at/below its knot
    assert (out.loc[x <= 15, "spl_15"] == 0).all()


def test_trimmed_mean_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_trimmed_mean,
    )

    out = q_trimmed_mean(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "n_chars"])
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy(np.int64))
        n = len(v)
        k = n * 5 // 100
        ref = v[k:n - k].mean()
        assert int(out.loc[src, "n"]) == n
        assert int(out.loc[src, "k_trim"]) == k
        assert abs(out.loc[src, "trimmed_mean"] - ref) < 5e-6
        # robust: between min and max, and within [p5, p95] closure
        assert v[k] - 1e-9 <= out.loc[src, "trimmed_mean"] <= v[n - k - 1] + 1e-9
