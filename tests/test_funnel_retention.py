"""funnel and retention_cohorts vs brute-force pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.temporal import funnel, retention_cohorts

STEPS = ["view", "click", "purchase"]


def _event_frame(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 86400 * 21, n), unit="s"
    )
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n),
            "ts": ts,
            "event_type": rng.choice(STEPS + ["error"], size=n),
        }
    )


def _funnel_bruteforce(df: pd.DataFrame) -> list[int]:
    counts = []
    reached = {}  # user -> ts of previous step
    for i, st in enumerate(STEPS):
        nxt = {}
        for uid, g in df[df["event_type"] == st].groupby("user_id"):
            if i == 0:
                nxt[uid] = g["ts"].min()
            elif uid in reached:
                after = g[g["ts"] > reached[uid]]
                if len(after):
                    nxt[uid] = after["ts"].min()
        reached = nxt
        counts.append(len(nxt))
    return counts


def test_funnel_matches_bruteforce():
    df = _event_frame(7, 3000, 40)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = funnel(ds, STEPS, num_buckets=7).to_pandas().sort_values("step")
    assert got["step"].tolist() == [1, 2, 3]
    assert got["event_type"].tolist() == STEPS
    assert got["n_users"].tolist() == _funnel_bruteforce(df)
    # monotone: each step can only lose users
    n = got["n_users"].to_numpy()
    assert (n[1:] <= n[:-1]).all()


def test_funnel_strictly_after_semantics():
    # user 1 does click BEFORE its first view -> never converts past step 1;
    # user 2 does the full ordered funnel; user 3 stops after click.
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        (1, t0 + pd.Timedelta(hours=1), "click"),
        (1, t0 + pd.Timedelta(hours=2), "view"),
        (2, t0 + pd.Timedelta(hours=1), "view"),
        (2, t0 + pd.Timedelta(hours=2), "click"),
        (2, t0 + pd.Timedelta(hours=3), "purchase"),
        (3, t0 + pd.Timedelta(hours=1), "view"),
        (3, t0 + pd.Timedelta(hours=1), "click"),  # same ts as view: NOT after
        (3, t0 + pd.Timedelta(hours=4), "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = funnel(ds, STEPS, num_buckets=3).to_pandas().sort_values("step")
    assert got["n_users"].tolist() == [3, 2, 1]


def test_retention_matches_bruteforce():
    df = _event_frame(11, 4000, 30)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    got = (
        retention_cohorts(ds, period_days=7, num_buckets=5)
        .to_pandas()
        .sort_values(["cohort_day", "offset"])
        .reset_index(drop=True)
    )
    day = df["ts"].dt.floor("D").astype("int64") // (86400 * 10**9)
    cells = pd.DataFrame({"user_id": df["user_id"], "d": day}).drop_duplicates()
    c = cells.groupby("user_id")["d"].transform("min")
    wk = pd.DataFrame(
        {"user_id": cells["user_id"], "cohort_day": c, "offset": (cells["d"] - c) // 7}
    ).drop_duplicates()
    exp = (
        wk.groupby(["cohort_day", "offset"]).size().reset_index(name="n_users")
        .sort_values(["cohort_day", "offset"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every user appears in offset 0 of their own cohort
    total_users = df["user_id"].nunique()
    assert got[got["offset"] == 0]["n_users"].sum() == total_users
