"""Batch 150: clock-drift audit, language-mix drift, spend-speed
correlation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_clock_drift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_clock_drift,
    )

    out = t_clock_drift(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    t = ev["ts"].values.astype("datetime64[us]").astype(np.int64)
    mid = (t.min() + t.max()) // 2
    peaks = {}
    for h, mask in ((0, t <= mid), (1, t > mid)):
        hr = (t[mask] // 3_600_000_000) % 24
        vc = pd.Series(hr).value_counts()
        peaks[h] = sorted(vc.items(),
                          key=lambda kv: (-kv[1], kv[0]))[0][0]
    d = abs(peaks[0] - peaks[1])
    row = out.iloc[0]
    assert row["first_half_peak_hour"] == peaks[0]
    assert row["second_half_peak_hour"] == peaks[1]
    assert row["circular_shift_hours"] == min(d, 24 - d)


def test_lang_drift(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_lang_drift,
    )

    out = d_lang_drift(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    dmax = docs["doc_id"].max()
    docs["h"] = (2 * docs["doc_id"] > dmax).astype(int)
    g = docs.groupby(["lang", "h"]).size()
    tot = docs.groupby("h").size()
    langs = sorted(docs["lang"].unique())
    assert list(out["lang"]) == langs
    deltas = []
    for _, row in out.iterrows():
        lg = row["lang"]
        n0 = int(g.get((lg, 0), 0))
        n1 = int(g.get((lg, 1), 0))
        assert row["n_first"] == n0
        assert row["n_second"] == n1
        s0, s1 = n0 / tot[0], n1 / tot[1]
        assert abs(row["share_first"] - s0) < 2e-6
        assert abs(row["share_second"] - s1) < 2e-6
        deltas.append(abs(s1 - s0))
    assert abs(out.iloc[0]["max_share_delta"]
               - max(deltas)) < 3e-6


def test_spend_speed_corr(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_spend_speed_corr,
    )

    out = q_spend_speed_corr(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["d"] = od["o_orderdate"].values.astype("datetime64[D]") \
        .astype(np.int64)
    od["c"] = np.floor(od["o_totalprice"] * 100
                       + 0.5).astype(int) // 100
    od = od.sort_values(["o_custkey", "d", "o_orderkey"])
    u = od["o_custkey"].to_numpy()
    d = od["d"].to_numpy()
    c = od["c"].to_numpy(float)
    same = u[1:] == u[:-1]
    x = c[:-1][same]
    y = (d[1:] - d[:-1])[same].astype(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["n_pairs"] == len(x)
    assert abs(row["value_gap_r"] - r) < 2e-6
