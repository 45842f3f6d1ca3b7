"""transition_counts and interarrival_stats vs brute-force pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.temporal import (
    interarrival_stats,
    transition_counts,
)


def _events(seed: int, n: int, n_users: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 86400 * 5, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], size=n),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )


def test_transition_counts_matches_bruteforce():
    df = _events(3, 2500, 25)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = (
        transition_counts(ds, tiebreak="event_id", num_buckets=4)
        .to_pandas().sort_values(["from_type", "to_type"]).reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    same = s["user_id"].to_numpy()[:-1] == s["user_id"].to_numpy()[1:]
    et = s["event_type"].to_numpy(dtype=object)
    exp = (
        pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        .groupby(["from_type", "to_type"]).size().reset_index(name="n")
    )
    exp["p"] = np.round(
        exp["n"] / exp.groupby("from_type")["n"].transform("sum"), 6
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # probabilities row-normalize to ~1 per from_type
    sums = got.groupby("from_type")["p"].sum()
    assert np.allclose(sums, 1.0, atol=1e-5)


def test_interarrival_matches_bruteforce():
    df = _events(8, 1800, 20)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    got = (
        interarrival_stats(ds, tiebreak="event_id", num_buckets=3)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    t = s["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    u = s["user_id"].to_numpy()
    same = u[:-1] == u[1:]
    gaps = pd.DataFrame({"user_id": u[1:][same], "g": (t[1:] - t[:-1])[same]})
    gb = gaps.groupby("user_id")["g"]
    exp = pd.DataFrame(
        {
            "n_gaps": gb.size(),
            "gap_min_us": gb.min(),
            "gap_max_us": gb.max(),
            "gap_mean_us": np.round(gb.mean(), 6),
        }
    ).reset_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interarrival_single_event_user_excluded():
    df = pd.DataFrame(
        {
            "user_id": [1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00", "2024-01-01 01:00:10"]
            ),
            "event_id": [0, 1, 2],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = interarrival_stats(ds, tiebreak="event_id", num_buckets=2).to_pandas()
    assert got["user_id"].tolist() == [2]
    assert got["gap_min_us"].tolist() == [10_000_000]
