"""Log-rank test / association rules / Benford audit vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _surv_reference():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    ev = ev.assign(t=ev["ts"].to_numpy("datetime64[us]").astype(np.int64))
    t_end = int(ev["t"].max())
    signups = ev[ev["event_type"] == "signup"].groupby("user_id")["t"].min()
    uids, durs, evs = [], [], []
    for uid, t0 in signups.items():
        later = ev[(ev["user_id"] == uid) & (ev["event_type"] == "purchase")
                   & (ev["t"] >= t0)]
        uids.append(uid)
        if len(later):
            durs.append(int(later["t"].min() - t0)); evs.append(True)
        else:
            durs.append(t_end - t0); evs.append(False)
    return np.array(uids), np.array(durs), np.array(evs)


def test_logrank_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_logrank

    out = t_logrank(SF).iloc[0]
    uids, durs, evs = _surv_reference()
    grp = uids % 2 == 1
    oe, vv = 0.0, 0.0
    for t in np.unique(durs[evs]):
        n1 = int((durs[grp] >= t).sum())
        n0 = int((durs[~grp] >= t).sum())
        d1 = int(((durs == t) & evs & grp).sum())
        d0 = int(((durs == t) & evs & ~grp).sum())
        n, d = n1 + n0, d1 + d0
        oe += d1 - d * n1 / n
        if n > 1:
            vv += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    assert int(out["n1"]) == int(grp.sum())
    assert int(out["n0"]) == int((~grp).sum())
    assert int(out["events1"]) == int((evs & grp).sum())
    assert int(out["events0"]) == int((evs & ~grp).sum())
    assert abs(out["o_minus_e"] - oe) < 5e-4
    assert abs(out["var"] - vv) < 5e-4
    if vv > 0:
        assert abs(out["z"] - oe / np.sqrt(vv)) < 5e-4
        assert abs(out["chi2"] - out["z"] ** 2) < 5e-5


def test_assoc_rules_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_assoc_rules,
    )

    out = q_assoc_rules(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    d = li.drop_duplicates()
    N = d["l_orderkey"].nunique()
    item = d.groupby("l_partkey")["l_orderkey"].nunique()
    from collections import Counter
    pair = Counter()
    for _, g in d.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair[(ps[i], ps[j])] += 1
    exp = {k: v for k, v in pair.items() if v >= 3}
    assert len(out) == len(exp)
    for _, r in out.iterrows():
        key = (int(r["a"]), int(r["b"]))
        cab = exp[key]
        ca, cb = int(item[key[0]]), int(item[key[1]])
        assert int(r["c_ab"]) == cab
        assert int(r["c_a"]) == ca and int(r["c_b"]) == cb
        assert abs(r["support"] - cab / N) < 5e-6
        assert abs(r["conf_ab"] - cab / ca) < 5e-6
        assert abs(r["conf_ba"] - cab / cb) < 5e-6
        assert abs(r["lift"] - cab * N / (ca * cb)) < 5e-6
        # confidence bounds and lift consistency
        assert 0 < r["support"] <= 1 and 0 < r["conf_ab"] <= 1


def test_benford_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_benford

    out = q_benford(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_extendedprice"])
    c = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    first = pd.Series(c).astype(str).str[0].astype(int)
    obs = first.value_counts().sort_index()
    N = len(c)
    assert (out["digit"].to_numpy() == obs.index.to_numpy()).all()
    assert (out["observed"].to_numpy() == obs.to_numpy()).all()
    chi2 = 0.0
    for d, o in obs.items():
        e = N * np.log10(1 + 1 / d)
        chi2 += (o - e) ** 2 / e
    assert abs(out["chi2"].iloc[0] - chi2) < 5e-3
    assert (out["chi2"].to_numpy() == out["chi2"].iloc[0]).all()
    # expected counts sum to ~N (Benford probabilities sum to 1)
    assert abs(out["expected"].sum() - N) < 1e-2
