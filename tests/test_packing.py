"""packed_layout: distributed ordered prefix-scan vs a numpy oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from complexity_driven_feature_construction_ray.stages.packing import packed_layout


def _oracle(ids, sizes, chunk):
    order = np.argsort(ids, kind="stable")
    ids, sizes = np.asarray(ids)[order], np.asarray(sizes)[order]
    start = np.concatenate(([0], np.cumsum(sizes[:-1])))
    last = start + np.maximum(sizes - 1, 0)
    return {
        int(i): (int(s), int(s // chunk), int(l // chunk), int(l // chunk - s // chunk + 1))
        for i, s, l in zip(ids, start, last)
    }


def _run(ids, sizes, chunk, **kw):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "n": pa.array(sizes, type=pa.int64())})
    )
    out = packed_layout(ds, id_col="doc_id", size_col="n", chunk=chunk, **kw).to_pandas()
    return {
        int(r.doc_id): (int(r.tok_start), int(r.seq_first), int(r.seq_last), int(r.n_seqs))
        for r in out.itertuples()
    }


def test_matches_numpy_oracle_random():
    rng = np.random.default_rng(7)
    ids = rng.permutation(500)
    sizes = rng.integers(0, 900, size=500)
    assert _run(ids, sizes, 256) == _oracle(ids, sizes, 256)


def test_empty_docs_and_boundary_crossing():
    ids = [10, 11, 12, 13]
    sizes = [100, 0, 100, 250]  # doc 13 starts at 200, ends 449 -> spans chunks 2..4
    got = _run(ids, sizes, 100)
    assert got[11] == (100, 1, 1, 1)  # empty doc lands at its offset
    assert got[13] == (200, 2, 4, 3)


def test_noncontiguous_ids_many_buckets():
    ids = np.arange(0, 4000, 7)  # sparse ids
    sizes = np.full(len(ids), 33)
    got = _run(ids, sizes, 128, num_buckets=16)
    assert got == _oracle(ids, sizes, 128)


def test_explicit_bounds_skip_minmax_pass():
    ids = np.arange(100)
    sizes = np.ones(100, dtype=int)
    got = _run(ids, sizes, 8, id_bounds=(0, 99), num_buckets=4)
    assert got == _oracle(ids, sizes, 8)


def test_total_stream_is_contiguous():
    rng = np.random.default_rng(11)
    sizes = rng.integers(1, 50, size=300)
    got = _run(np.arange(300), sizes, 64, num_buckets=8)
    starts = np.array([got[i][0] for i in range(300)])
    assert starts[0] == 0
    assert (np.diff(starts) == sizes[:-1]).all()  # no gaps, no overlaps


def test_rejects_bad_chunk():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "n": [1]}))
    with pytest.raises(ValueError):
        packed_layout(ds, id_col="doc_id", size_col="n", chunk=0)
