"""Join-size estimation / peak detection / streaks / EXCEPT ALL vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_join_size_matches_actual_join(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_join_size_est

    out = q_join_size_est(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    actual = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert int(out["join_rows"].iloc[0]) == len(actual)
    assert int(out["distinct_a"].iloc[0]) == orders["o_custkey"].nunique()
    assert int(out["distinct_b"].iloc[0]) == cust["c_custkey"].nunique()
    a = orders["o_custkey"].value_counts()
    b = cust["c_custkey"].value_counts()
    common = a.index.intersection(b.index)
    assert int(out["matched_keys"].iloc[0]) == len(common)
    assert int(out["max_key_product"].iloc[0]) == int((a[common] * b[common]).max())


def test_peak_detect_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_peak_detect

    out = t_peak_detect(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    total_peaks = 0
    for uid, g in ev.groupby("user_id"):
        c = np.floor(g["value"].to_numpy(np.float64) * 100 + 0.5)
        peaks = [c[i] for i in range(1, len(c) - 1)
                 if c[i] > c[i - 1] and c[i] > c[i + 1]]
        assert int(out.loc[uid, "n_peaks"]) == len(peaks)
        if peaks:
            assert out.loc[uid, "max_peak"] == max(peaks) / 100.0
        else:
            assert np.isnan(out.loc[uid, "max_peak"])
        total_peaks += len(peaks)
    assert total_peaks > 0


def test_streak_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_streak

    out = t_streak(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    days = ev["ts"].to_numpy("datetime64[us]").astype(np.int64) // 86_400_000_000
    df = pd.DataFrame({"u": ev["user_id"], "d": days}).drop_duplicates()
    for uid, g in df.groupby("u"):
        d = np.sort(g["d"].to_numpy())
        runs, cur = [], 1
        for i in range(1, len(d)):
            if d[i] == d[i - 1] + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert int(out.loc[uid, "longest_streak"]) == max(runs)
        assert int(out.loc[uid, "n_streaks"]) == len(runs)


def test_except_all_multiplicity(ray_session):
    from collections import Counter

    from complexity_driven_feature_construction_ray.pipelines.relational import q_except_all

    out = q_except_all(SF)
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    a = Counter(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                           "o_orderkey"])
    b = Counter(li["l_orderkey"])
    exp = {k: n - b.get(k, 0) for k, n in a.items() if n - b.get(k, 0) > 0}
    got = dict(zip(out["o_orderkey"].astype(int), out["n_copies"].astype(int)))
    assert got == exp
