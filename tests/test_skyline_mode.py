"""Skyline combiner vs brute force; grouped mode tie rule; fertility."""

import numpy as np
import pandas as pd
import ray.data


def _brute_skyline(df, x, y):
    keep = []
    for i, a in df.iterrows():
        dominated = ((df[x] >= a[x]) & (df[y] <= a[y])
                     & ((df[x] > a[x]) | (df[y] < a[y]))).any()
        if not dominated:
            keep.append(i)
    return df.loc[keep]


def test_skyline_matches_bruteforce_randomized(ray_session):
    from complexity_driven_feature_construction_ray.stages.partition import skyline_2d

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(300),
        "x": rng.integers(0, 40, 300).astype(np.float64),
        "y": rng.integers(0, 40, 300).astype(np.int64),
    })
    out = skyline_2d(ray.data.from_pandas(df).repartition(6), x_col="x", y_col="y")
    exp = _brute_skyline(df, "x", "y")
    assert sorted(out["id"]) == sorted(exp["id"])


def test_skyline_duplicate_pairs_survive(ray_session):
    from complexity_driven_feature_construction_ray.stages.partition import skyline_2d

    df = pd.DataFrame({"id": [1, 2, 3], "x": [5.0, 5.0, 1.0], "y": [2, 2, 9]})
    out = skyline_2d(ray.data.from_pandas(df), x_col="x", y_col="y")
    assert sorted(out["id"]) == [1, 2]


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_grouped_mode

    out = q_grouped_mode("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])
    for _, r in out.iterrows():
        c = li[li.l_returnflag == r.l_returnflag]["l_quantity"].value_counts()
        top = c[c == c.max()]
        assert r.mode_qty == min(top.index)
        assert r.n == c.max()


def test_fertility_bounds(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_fertility

    out = d_fertility("/root/testdata/sf0.001")
    # a subword tokenizer never emits fewer tokens than words
    assert (out["fertility"] >= 1.0).all()
    assert (out["bpe"] >= out["ws"]).all()
