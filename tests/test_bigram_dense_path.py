"""bigram_pair_counts' dense small-alphabet path (per-block bincount
blobs + 32:1 tree reduce, no pair-hash exchange) must return exactly
the bucketed path's top-k, including the deterministic
(n desc, (a, b) asc) tie order — pinned on a random byte-level corpus
with forced count ties.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from complexity_driven_feature_construction_ray.stages.token_stats import (
    bigram_pair_counts,
)


def _corpus(seed: int, n_rows: int, alpha: int):
    rng = np.random.default_rng(seed)
    rows = [
        rng.integers(0, alpha, rng.integers(2, 30)).astype(np.int64).tolist()
        for _ in range(n_rows)
    ]
    # force exact ties: two disjoint pairs repeated the same number of
    # times, appended as their own rows
    rows += [[alpha - 1, alpha - 2]] * 7 + [[alpha - 2, alpha - 1]] * 7
    return rows


def test_dense_equals_bucketed(ray_session):
    rows = _corpus(3, 400, 17)
    ds = ray.data.from_arrow(
        pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int64()))})
    ).repartition(5)
    dense = bigram_pair_counts(ds, k=40, alphabet_bound=17).to_pandas()
    ds2 = ray.data.from_arrow(
        pa.table({"tokens": pa.array(rows, type=pa.list_(pa.int64()))})
    ).repartition(5)
    bucketed = bigram_pair_counts(ds2, k=40).to_pandas()
    pd.testing.assert_frame_equal(
        dense.reset_index(drop=True), bucketed.reset_index(drop=True)
    )


def test_dense_rejects_out_of_range_ids(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"tokens": pa.array([[1, 2, 300]], type=pa.list_(pa.int64()))})
    )
    try:
        bigram_pair_counts(ds, k=5, alphabet_bound=256).to_pandas()
        raise AssertionError("expected out-of-range id to raise")
    except Exception as e:  # noqa: BLE001
        assert "alphabet_bound" in str(e)
