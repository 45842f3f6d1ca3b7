"""Sources and splits (SURVEY.md §2.1 parity).

- read_table: format-dispatched reader (parquet / csv) with column
  pruning — the reference's CSV ingest (reference reader/Reader.py:15-37)
  generalized to the formats Ray Data reads natively.
- dataset_from_arrays: the ScikitReader analog (reference
  reader/ScikitReader.py:18-59): wrap in-memory (X, y), coerce columns
  numeric where possible, flag the rest categorical, and return both
  the Dataset and the derived RawFeature leaves.
- hash_split: deterministic train/valid/test assignment by key hash —
  the distributed replacement for the reference's row-id Splitter
  (reference splitting/Splitter.py:12-43): reproducible on any worker,
  no driver-side index materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.expr import Feature, raw

_HASH_KEY = "0123456789123456"


def read_table(path: str, *, format: str = "parquet", columns: list[str] | None = None):
    import ray.data

    if format == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if format == "csv":
        ds = ray.data.read_csv(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if format in ("json", "jsonl"):
        # newline-delimited JSON — the lingua franca of raw LLM corpora
        # (one document object per line); Arrow's JSON reader streams it
        # file-parallel like any other source
        ds = ray.data.read_json(path)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    raise ValueError(f"unsupported format {format}")


def write_table(ds, path: str, *, format: str = "parquet") -> None:
    """Partitioned sink (one file per block — resumable layout, never
    one giant file). `jsonl` targets interchange with external corpus
    tooling; parquet is the engine's native checkpoint format."""
    if format == "parquet":
        ds.write_parquet(path)
        return
    if format in ("json", "jsonl"):
        ds.write_json(path)
        return
    raise ValueError(f"unsupported format {format}")


def dataset_from_arrays(
    X, y=None, feature_names: list[str] | None = None
) -> tuple["ray.data.Dataset", list[Feature]]:  # noqa: F821
    """In-memory (X, y) -> (Dataset, RawFeature leaves).

    Columns coercible with pd.to_numeric become numeric features; the
    rest are flagged categorical (reference ScikitReader.py:28-54)."""
    import ray.data

    if isinstance(X, pd.DataFrame):
        df = X.copy()
    else:
        X = np.asarray(X)
        names = feature_names or [f"f{i}" for i in range(X.shape[1])]
        df = pd.DataFrame(X, columns=names)

    feats: list[Feature] = []
    for c in df.columns:
        try:
            df[c] = pd.to_numeric(df[c])
            col = df[c].to_numpy(dtype=np.float64)
            finite = col[np.isfinite(col)]
            feats.append(
                raw(
                    str(c),
                    "numeric",
                    {
                        "missing_values": bool(np.isnan(col).any()),
                        "min": float(finite.min()) if len(finite) else None,
                        "max": float(finite.max()) if len(finite) else None,
                        "has_zero": bool((finite == 0).any()) if len(finite) else False,
                        "distinct": int(len(np.unique(finite))),
                    },
                )
            )
        except (ValueError, TypeError):
            vals = df[c].astype(str)
            feats.append(
                raw(
                    str(c),
                    "categorical",
                    {
                        "missing_values": bool(df[c].isna().any()),
                        "distinct": int(vals.nunique()),
                        "values": sorted(vals.unique().tolist()),
                    },
                )
            )
    if y is not None:
        df = df.assign(__label=np.asarray(y))
    return ray.data.from_pandas(df), feats


def hash_split(
    ds,
    *,
    key: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
):
    """Deterministic split assignment: hash(key, seed) -> cumulative
    fraction bucket. Same key always lands in the same split — across
    runs, workers and cluster sizes."""
    fractions = fractions or {"train": 0.6, "test": 0.4}
    names = list(fractions)
    cum = np.cumsum([fractions[n] for n in names])
    assert abs(cum[-1] - 1.0) < 1e-9, "fractions must sum to 1"

    def assign(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(
            np.char.add(vals.astype(str), f"#{seed}").astype(object), hash_key=_HASH_KEY
        )
        u = (h >> np.uint64(11)).astype(np.float64) * (2.0**-53)
        idx = np.searchsorted(cum, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        out = np.array(names, dtype=object)[idx]
        return batch.append_column(split_col, pa.array(out.astype(str)))

    return ds.map_batches(assign, batch_format="pyarrow")
