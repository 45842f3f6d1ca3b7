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
