"""Reshape stages: pivot (long -> wide) and unpivot/melt (wide -> long).

The reference reshapes only in driver-side pandas experiment scripts;
here both directions are streaming operators:

- `pivot_wide`: per-batch partial aggregation over (index, pivot)
  pairs (a pyarrow group_by inside map_batches), then ONE small hash
  aggregate over the partials — the combiner pattern. The wide frame
  is assembled driver-side and is index-cardinality-sized (never
  corpus-sized); pivot-value discovery is part of the same aggregate,
  no extra pass.
- `unpivot`: pure row-local flat_map — each batch explodes its value
  columns into (index, name, value) rows with numpy tile/repeat, no
  shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pivot_wide(
    ds,
    *,
    index_col: str,
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    prefix: str | None = None,
) -> pd.DataFrame:
    """Wide aggregate: one output row per index value, one column per
    distinct pivot value, cells = agg(value). agg in {sum, count,
    mean}. mean is computed as merged sum/count (mean partials don't
    merge)."""
    from ray.data.aggregate import Count, Sum

    want_cnt = agg in ("count", "mean")
    want_sum = agg in ("sum", "mean")

    def part(batch: pa.Table) -> pa.Table:
        aggs = [(value_col, "sum")] if want_sum else []
        aggs.append((value_col, "count"))
        g = batch.select([index_col, pivot_col, value_col]).group_by(
            [index_col, pivot_col]
        ).aggregate(aggs)
        cols = {index_col: g[index_col], pivot_col: g[pivot_col],
                "c": g[f"{value_col}_count"]}
        if want_sum:
            cols["s"] = g[f"{value_col}_sum"]
        return pa.table(cols)

    aggs = []
    if want_sum:
        aggs.append(Sum("s", alias_name="s"))
    aggs.append(Sum("c", alias_name="c"))
    merged = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby([index_col, pivot_col])
        .aggregate(*aggs)
        .to_pandas()
    )
    if agg == "sum":
        merged["v"] = merged["s"]
    elif agg == "count":
        merged["v"] = merged["c"]
    else:
        merged["v"] = merged["s"] / merged["c"].replace(0, np.nan)
    wide = merged.pivot(index=index_col, columns=pivot_col, values="v")
    p = prefix if prefix is not None else f"{value_col}_"
    wide.columns = [f"{p}{c}" for c in wide.columns]
    return wide.reset_index().sort_values(index_col).reset_index(drop=True)


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Melt wide columns into (id..., variable, value) rows — row-local,
    zero shuffle; output is len(value_cols) x input rows."""

    def melt(batch: pa.Table) -> pa.Table:
        m = len(batch)
        cols = {c: np.tile(batch[c].to_numpy(zero_copy_only=False), len(value_cols))
                for c in id_cols}
        cols[var_name] = np.repeat(np.array(value_cols, dtype=object), m)
        cols[value_name] = np.concatenate(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in value_cols]
        )
        return pa.table({k: pa.array(v) for k, v in cols.items()})

    return ds.map_batches(melt, batch_format="pyarrow")
