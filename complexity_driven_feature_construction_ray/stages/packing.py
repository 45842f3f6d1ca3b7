"""Concat-and-chunk sequence packing over a deterministic corpus order.

The standard LLM pre-training layout (GPT-2/3, Llama): concatenate every
document's tokens in a fixed global order and slice the stream into
fixed-length training sequences. The operator computes, for every
document, WHERE its tokens land in that virtual stream — its global
token offset, the first/last sequence index it touches, and how many
sequences it spans — without ever materializing the stream.

Distributed shape (an ordered prefix-scan, two passes):

  pass A  map_batches: per-batch partial sums of ``size_col`` per
          id-range bucket (np.bincount — only O(buckets) numbers leave
          each task) -> tiny Ray Sum aggregate -> B totals on the
          driver -> exclusive scan -> ``ray.put`` the B offsets.
  pass B  rows (id, size, bucket) hash to their range bucket; each
          group sorts by id, local-cumsums, adds its bucket's global
          offset. The only row-level exchange moves 24-byte rows.

At 100 TB nothing driver-side grows with the data: the driver holds one
int64 per bucket (buckets are data-sized, ~250k rows each) and the scan
over them is O(B). Reference analog: the reference materializes feature
matrices in pandas whole (`new_project/fastsklearnfeature/candidate_generation/...`);
there is no packing op to port — this is one of the additional
training-data operators the engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bucketing import default_buckets

__all__ = ["packed_layout"]


def _layout_schema(id_col: str) -> pa.Schema:
    return pa.schema(
        [
            (id_col, pa.int64()),
            ("tok_start", pa.int64()),
            ("seq_first", pa.int64()),
            ("seq_last", pa.int64()),
            ("n_seqs", pa.int64()),
        ]
    )


def packed_layout(
    ds,
    *,
    id_col: str = "doc_id",
    size_col: str = "n_tok",
    chunk: int = 2048,
    id_bounds: tuple[int, int] | None = None,
    num_buckets: int | None = None,
):
    """Per-document packed layout: (id, tok_start, seq_first, seq_last,
    n_seqs) for the concat-in-id-order, chunk-into-``chunk`` stream.

    ``id_bounds`` — (min_id, max_id); computed with a cheap Min/Max
    aggregate over the pruned stream when omitted (costs one extra pass
    over the two needed columns — pass bounds when the caller knows
    them, e.g. contiguously generated ids).
    """
    import ray
    from ray.data.aggregate import Max, Min, Sum

    if chunk <= 0:
        raise ValueError("chunk must be positive")

    B = num_buckets or default_buckets(ds)

    if id_bounds is None:
        row = ds.aggregate(Min(id_col), Max(id_col))
        id_bounds = (int(row[f"min({id_col})"]), int(row[f"max({id_col})"]))
    lo, hi = id_bounds
    span = max(1, (hi - lo + B) // B)  # ceil((hi-lo+1)/B)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return np.clip((ids - lo) // span, 0, B - 1)

    # ---- pass A: per-bucket totals (only O(B) numbers per task) ----
    def partial_sums(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = batch[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = bucket_of(ids)
        tot = np.zeros(B, dtype=np.int64)
        np.add.at(tot, b, sizes)  # integer-exact (bincount would go via float64)
        nz = np.flatnonzero(tot)
        return pa.table(
            {
                "__b": pa.array(nz.astype(np.int64)),
                "part": pa.array(tot[nz]),
            }
        )

    totals = (
        ds.map_batches(partial_sums, batch_format="pyarrow")
        .groupby("__b")
        .aggregate(Sum("part", alias_name="tot"))
        .take_all()
    )
    per_bucket = np.zeros(B, dtype=np.int64)
    for r in totals:
        per_bucket[int(r["__b"])] = int(r["tot"])
    offsets = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))  # exclusive scan
    offsets_ref = ray.put(offsets)

    # ---- pass B: within-bucket ordered cumsum + global offset ----
    def layout(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _layout_schema(id_col).empty_table()
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = g[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, sizes = ids[order], sizes[order]
        off = ray.get(offsets_ref)
        start = off[int(bucket_of(ids[:1])[0])] + np.concatenate(
            ([0], np.cumsum(sizes[:-1]))
        )
        # an empty doc still "lands" at its offset inside one sequence
        last = start + np.maximum(sizes - 1, 0)
        seq_first = start // chunk
        seq_last = last // chunk
        return pa.table(
            {
                id_col: pa.array(ids),
                "tok_start": pa.array(start),
                "seq_first": pa.array(seq_first),
                "seq_last": pa.array(seq_last),
                "n_seqs": pa.array(seq_last - seq_first + 1),
            }
        )

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                size_col: batch[size_col].cast(pa.int64()),
                "__b": pa.array(bucket_of(ids)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(layout, batch_format="pyarrow")
    )
