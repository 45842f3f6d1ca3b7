"""Global ordered cumsum + shard planner vs brute force."""

import numpy as np
import pandas as pd
import ray.data


def test_ordered_cumsum_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.stages.partition import ordered_cumsum

    rng = np.random.default_rng(3)
    n = 2000
    pdf = pd.DataFrame({
        "id": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-5, 50, n).astype(np.int64),
    })
    pdf["blk"] = pdf["id"] // 97
    out = (
        ordered_cumsum(ray.data.from_pandas(pdf).repartition(9),
                       range_col="blk", order_cols=["id"], value_col="v",
                       out_col="cs")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    exp = pdf.sort_values("id").reset_index(drop=True)
    exp["cs"] = exp["v"].cumsum()
    assert (out["cs"].to_numpy() == exp["cs"].to_numpy()).all()


def test_shard_plan_balanced(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_shard_plan

    out = d_shard_plan("/root/testdata/sf0.001")
    # shards are contiguous doc_id ranges in order
    assert (out["shard"].to_numpy() == np.arange(len(out))).all()
    assert (out["first_doc"].to_numpy()[1:] > out["last_doc"].to_numpy()[:-1]).all()
    # shard k's last doc has cumulative tokens in (k*target, (k+1)*target]
    # — shards fill to the boundary without splitting a document
    cum = out["tokens"].to_numpy().cumsum()
    k = np.arange(len(out))
    assert (cum > 2000 * k).all()
    assert (cum[:-1] <= 2000 * (k[:-1] + 1)).all()


def test_interleave_round_robin_property(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_interleave

    out = d_interleave("/root/testdata/sf0.001")
    assert len(out) == 200
    # rn is non-decreasing along the manifest and each (rn, source)
    # appears at most once — a true round-robin
    assert (np.diff(out["rn"].to_numpy()) >= 0).all()
    assert not out.duplicated(["rn", "source"]).any()
    # the first full round touches every source once
    n_src = out["source"].nunique()
    first_round = out.head(n_src)
    assert first_round["source"].nunique() == n_src


def test_q_components_matches_union_find(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_components

    out = q_components("/root/testdata/sf0.001")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_partkey"])
    li = li[li.l_orderkey & 63 == 0]
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in li.iterrows():
        a, b = find(int(r.l_suppkey)), find(int(r.l_partkey) + 10_000_000)
        if a != b:
            parent[max(a, b)] = min(a, b)
    # normalize to min-id representative
    exp = {n: find(n) for n in list(parent)}
    got = dict(zip(out["id"], out["component"]))
    assert got == exp
