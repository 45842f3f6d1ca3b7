"""Batch 102: next-order part affinity, exit-type census, per-user
gap-regularity (CV) league."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_next_order_affinity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_next_order_affinity,
    )

    out = q_next_order_affinity(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderkey",
                                  "o_orderdate"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]) \
        .drop_duplicates()
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                        kind="stable")
    c = od["o_custkey"].to_numpy()
    o = od["o_orderkey"].to_numpy()
    same = c[1:] == c[:-1]
    pr = pd.DataFrame({"o1": o[:-1][same], "o2": o[1:][same]})
    j = (pr.merge(li, left_on="o1", right_on="l_orderkey")
         .rename(columns={"l_partkey": "a"})
         .drop(columns=["l_orderkey"])
         .merge(li, left_on="o2", right_on="l_orderkey")
         .rename(columns={"l_partkey": "b"}))
    exp = (j.groupby(["a", "b"], as_index=False).size()
           .rename(columns={"size": "n"})
           .sort_values(["n", "a", "b"],
                        ascending=[False, True, True],
                        kind="stable").head(10).reset_index(drop=True))
    assert len(out) == len(exp)
    for i in range(len(out)):
        assert out.loc[i, "part_a"] == exp.loc[i, "a"]
        assert out.loc[i, "part_b"] == exp.loc[i, "b"]
        assert out.loc[i, "n_pairs"] == exp.loc[i, "n"]


def test_exit_census_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_exit_census,
    )

    out = t_exit_census(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    last = ev.groupby("user_id").last()
    ex = last["event_type"].value_counts()
    al = ev["event_type"].value_counts()
    nu, ne = len(last), len(ev)
    assert len(out) == len(al)
    for _, row in out.iterrows():
        et = row["event_type"]
        nx = int(ex.get(et, 0))
        assert row["n_exits"] == nx
        assert abs(row["exit_share"] - nx / nu) < 2e-6
        assert abs(row["overall_share"] - al[et] / ne) < 2e-6
        assert abs(row["exit_lift"]
                   - (nx / nu) / (al[et] / ne)) < 2e-5


def test_user_regularity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        t_user_regularity,
    )

    out = t_user_regularity(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    sec = ev["ts"].astype("datetime64[us]").astype(np.int64) \
        // 1_000_000
    u = ev["user_id"].to_numpy()
    same = u[1:] == u[:-1]
    g = pd.DataFrame({"u": u[1:][same],
                      "g": (sec.to_numpy()[1:] - sec.to_numpy()[:-1])
                      [same]})
    cvs = []
    for _, grp in g.groupby("u"):
        x = grp["g"].to_numpy(np.float64)
        if len(x) < 2 or x.sum() == 0:
            continue
        cvs.append(x.std() / x.mean())
    cvs = np.sort(np.array(cvs))
    n = len(cvs)
    row = out.iloc[0]
    assert row["n_users"] == n
    assert abs(row["median_cv"] - cvs[(n + 1) // 2 - 1]) < 2e-6
    assert abs(row["mean_cv"] - cvs.mean()) < 2e-5
    assert abs(row["regular_share"] - (cvs < 0.5).mean()) < 2e-6
