"""tumbling_agg and top_tokens vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from complexity_driven_feature_construction_ray.stages.temporal import tumbling_agg
from complexity_driven_feature_construction_ray.stages.text import top_tokens


def test_tumbling_matches_pandas():
    rng = np.random.default_rng(3)
    n = 2000
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400 * 3, n), unit="s")
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 20, n), "ts": ts, "value": rng.normal(size=n)}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        tumbling_agg(ds, key="user_id", ts="ts", value="value", width_s=3600)
        .to_pandas()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(win=df["ts"].astype("int64") // (3600 * 10**9))  # pandas ns -> hour
        .groupby(["user_id", "win"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["win"].tolist() == exp["win"].tolist()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert np.allclose(got["sum_value"], np.round(exp["sum_value"], 6), atol=1e-6)


def test_hopping_matches_pandas():
    from complexity_driven_feature_construction_ray.stages.temporal import hopping_agg

    rng = np.random.default_rng(9)
    n = 1500
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 86400, n), unit="s")
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 10, n), "ts": ts, "value": rng.normal(size=n)}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    got = (
        hopping_agg(ds, key="user_id", ts="ts", value="value", width_s=3600, hop_s=1200)
        .to_pandas()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    # brute force: event at t belongs to windows base-2..base of 20-min hops
    base = df["ts"].astype("int64") // (1200 * 10**9)
    rows = []
    for k in (0, 1, 2):
        rows.append(df.assign(win=base - k))
    exp = (
        pd.concat(rows)
        .groupby(["user_id", "win"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["user_id", "win"])
        .reset_index(drop=True)
    )
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["win"].tolist() == exp["win"].tolist()
    assert np.allclose(got["sum_value"], np.round(exp["sum_value"], 6), atol=1e-6)
    # every event lands in exactly width/hop = 3 windows
    assert got["n_events"].sum() == 3 * n


def test_hopping_rejects_misaligned_hop():
    import pytest

    from complexity_driven_feature_construction_ray.stages.temporal import hopping_agg

    df = pd.DataFrame({"user_id": [0], "ts": [pd.Timestamp("2024-01-01")], "value": [1.0]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    with pytest.raises(ValueError):
        hopping_agg(ds, key="user_id", ts="ts", value="value", width_s=3600, hop_s=700)


def test_top_tokens_exact_with_ties():
    texts = ["b a", "a c b", "d d", ""] * 10  # a:20 b:20 c:10 d:20
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = top_tokens(ds, k=3).to_pandas()
    # counts a=20 b=20 d=20 -> tie broken by token text ascending
    assert got["token"].tolist() == ["a", "b", "d"]
    assert got["c"].tolist() == [20, 20, 20]


def test_top_tokens_k_larger_than_vocab():
    ds = ray.data.from_arrow(pa.table({"text": pa.array(["x y", "y"])}))
    got = top_tokens(ds, k=10).to_pandas()
    assert got["token"].tolist() == ["y", "x"]
    assert got["c"].tolist() == [2, 1]


def test_grouped_topn_matches_pandas_with_ties():
    from complexity_driven_feature_construction_ray.stages.sampling import grouped_topn

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(1000),
            "g": rng.integers(0, 7, 1000),
            "v": rng.integers(0, 20, 1000),  # many ties
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        grouped_topn(ds, key_col="g", order_col="v", n=5, tiebreak_col="id")
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .groupby("g", sort=False)
        .head(5)
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    assert got[["id", "g", "v"]].values.tolist() == exp[["id", "g", "v"]].values.tolist()


def test_grouped_topn_ascending():
    from complexity_driven_feature_construction_ray.stages.sampling import grouped_topn

    df = pd.DataFrame({"id": [0, 1, 2, 3], "g": [0, 0, 0, 0], "v": [9, 1, 5, 3]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = grouped_topn(
        ds, key_col="g", order_col="v", n=2, descending=False, tiebreak_col="id"
    ).to_pandas()
    assert sorted(got["v"].tolist()) == [1, 3]


def test_hopping_modes_agree():
    """bucket (sparse default) and combine (dense) strategies return
    identical results."""
    from complexity_driven_feature_construction_ray.stages.temporal import hopping_agg

    rng = np.random.default_rng(3)
    n = 900
    ts = pd.Timestamp("2024-06-01") + pd.to_timedelta(rng.integers(0, 40000, n), unit="s")
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 7, n), "ts": ts, "value": rng.normal(size=n)}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    outs = []
    for mode in ("bucket", "combine"):
        outs.append(
            hopping_agg(
                ds, key="user_id", ts="ts", value="value",
                width_s=3600, hop_s=1200, mode=mode,
            )
            .to_pandas()
            .sort_values(["user_id", "win"])
            .reset_index(drop=True)
        )
    a, b = outs
    assert a["user_id"].tolist() == b["user_id"].tolist()
    assert a["win"].tolist() == b["win"].tolist()
    assert a["n_events"].tolist() == b["n_events"].tolist()
    assert np.allclose(a["sum_value"], b["sum_value"], atol=1e-9)
