"""Explicit partitioning utilities: range-partition sort and the
skew-salting shuffle.

The north-star layout is range partitioning by (doc_id, ingest_ts) with
an explicit sort; grouped aggregates over skewed keys (the Zipfian
`source` column: 55% of rows share one value) must not ship every row
of the hot key to one reducer. Two complementary answers:

- `range_partition_sort`: Ray Data's sort IS a range-partitioning
  shuffle (sample -> range boundaries -> exchange -> per-partition
  sort); output blocks are non-overlapping sorted ranges, the layout
  cursor-based stages (as-of merge, windows) want.
- `salted_aggregate`: the classic two-phase skew-salting shuffle made
  explicit: stage 1 groups by (key, hash(doc) % salt) so a hot key
  spreads over `salt` reducers; stage 2 merges the tiny per-salt
  partials. Mergeable aggregates only (sum/count/min/max/mean).

Note the engine's *default* answer to skew is even cheaper: partial
aggregation inside map_batches (stages/fit.py) — only O(batches x keys)
summary rows ever reach a shuffle. `salted_aggregate` is the explicit
shuffle-level variant for when the per-batch combiner doesn't apply
(e.g. the grouping key set is too large to hold per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def range_partition_sort(ds, keys: list[str], *, num_partitions: int | None = None):
    """Globally sort (= range-partition) by `keys`; optionally repartition
    first so the sort has enough input blocks to sample well."""
    if num_partitions is not None:
        ds = ds.repartition(num_partitions)
    return ds.sort(keys)


_MERGE = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    # mean = (sum, count) partials merged then divided
    "mean": ("mean", None),
}


def salted_aggregate(
    ds,
    *,
    key: str,
    col: str,
    agg: str = "sum",
    salt: int = 16,
    out_col: str | None = None,
):
    """Two-phase skew-salted grouped aggregate: returns a Dataset with
    one row per key value: (key, out_col)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    assert agg in _MERGE, agg
    out_col = out_col or f"{agg}_{col}"

    def add_salt(batch: pa.Table) -> pa.Table:
        # salt by row position: rows of a hot key spread uniformly over
        # `salt` sub-keys regardless of the key distribution
        salt_col = (np.arange(len(batch)) % salt).astype(np.int32)
        return batch.append_column("__salt", pa.array(salt_col))

    # phase 1: (key, salt) partials — the hot key fans out over `salt` reducers
    if agg == "sum":
        a1 = Sum(col, alias_name="__p")
    elif agg == "count":
        a1 = Count(alias_name="__p")
    elif agg == "min":
        a1 = Min(col, alias_name="__p")
    elif agg == "max":
        a1 = Max(col, alias_name="__p")
    else:  # mean: track sum and count partials
        a1 = None

    salted = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=None)
    if agg == "mean":
        part = salted.groupby([key, "__salt"]).aggregate(
            Sum(col, alias_name="__s"), Count(alias_name="__n")
        )
        final = part.groupby(key).aggregate(
            Sum("__s", alias_name="__ss"), Sum("__n", alias_name="__nn")
        )

        def div(batch: pa.Table) -> pa.Table:
            v = batch["__ss"].to_numpy() / batch["__nn"].to_numpy()
            return pa.table({key: batch[key], out_col: pa.array(v)})

        return final.map_batches(div, batch_format="pyarrow", batch_size=None)

    part = salted.groupby([key, "__salt"]).aggregate(a1)
    _, merge_kind = _MERGE[agg]
    a2 = {"sum": Sum, "min": Min, "max": Max}[merge_kind]("__p", alias_name=out_col)
    return part.groupby(key).aggregate(a2)
