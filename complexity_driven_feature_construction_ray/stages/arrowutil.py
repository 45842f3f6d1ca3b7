"""Small Arrow helpers shared by the embedding/dedup/similarity stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a fixed-width list column without a per-row
    Python conversion: flatten() honors list offsets, the flat values
    buffer converts zero-copy (or one memcpy for non-native dtypes) and
    reshapes. Replaces np.stack(col.to_pylist()) — which builds n Python
    lists — in the embedding hot paths (VERDICT r1 item 10)."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return np.empty((0, 0), dtype=dtype)
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # pyarrow version drift
            col = col.chunk(0)
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if not isinstance(col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        # Ray's ArrowTensorArray extension (from_pandas of ndarray cells)
        # and friends: to_numpy yields the (n, dim) tensor directly
        out = np.asarray(col.to_numpy(zero_copy_only=False))
        if out.ndim == 1 and out.dtype == object:
            out = np.stack(out)
        return out.reshape(n, -1).astype(dtype, copy=False)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        # validate via the offsets, not total-length divisibility: a
        # ragged batch whose total happens to divide n would otherwise
        # reshape into silently-wrong rows
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths != widths[0]).any():
            raise ValueError("ragged list column; fixed-width embeddings expected")
    vals = col.flatten().to_numpy(zero_copy_only=False)
    if len(vals) % n != 0:
        raise ValueError("ragged list column; fixed-width embeddings expected")
    out = vals.reshape(n, len(vals) // n)
    return out.astype(dtype, copy=False)


def sorted_lookup(sorted_keys: np.ndarray, values: np.ndarray):
    '''(idx, found) for probing `values` against a SORTED key array --
    the broadcast-membership primitive shared by the semi/anti joins,
    the broadcast hash join, and apply_dedup. Safe on an empty key set
    (found is all-False).'''
    if len(sorted_keys) == 0:
        return np.zeros(len(values), dtype=np.int64), np.zeros(len(values), dtype=bool)
    idx = np.clip(np.searchsorted(sorted_keys, values), 0, len(sorted_keys) - 1)
    return idx, sorted_keys[idx] == values


def list_to_binary(col) -> pa.Array:
    """Encode each row of a list<int32> column as its raw little-endian
    bytes, producing a large_binary array built directly from the flat
    values buffer (no per-row Python). Two equal token sequences encode
    to equal bytes, so downstream exact-dedup / grouping on the column
    is token-array equality."""
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths.astype(np.float64), nan=0.0).astype(np.int64)
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    out = pa.Array.from_buffers(
        pa.large_binary(),
        len(lengths),
        [None, pa.py_buffer((off * 4).tobytes()), pa.py_buffer(values.tobytes())],
    )
    if arr.null_count:
        # keep null rows NULL (not b'') so a null list stays distinct
        # from an empty list under downstream grouping — SQL semantics
        out = pc.if_else(arr.is_null(), pa.scalar(None, pa.large_binary()), out)
    return out


def cast_fixed_list(ds, col: str, dim: int, dtype: pa.DataType | None = None):
    """Ingestion-time cast of a variable `list<T>` column to
    `fixed_size_list<T, dim>` so every downstream stage can read the
    embedding width from METADATA instead of partially executing the
    pipeline (the retired ds.take(1) fallback). Ragged rows fail loudly
    inside the map task. Returns a new Dataset; zero-copy on the values
    buffer (only the offsets are dropped)."""

    def cast(batch: pa.Table) -> pa.Table:
        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if isinstance(c, pa.FixedSizeListArray):
            return batch
        if isinstance(c, (pa.ListArray, pa.LargeListArray)):
            offs = c.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if len(widths) and (widths != dim).any():
                raise ValueError(
                    f"cast_fixed_list: column {col!r} has rows of width "
                    f"{set(int(w) for w in widths[widths != dim][:3])}, "
                    f"expected {dim}"
                )
            flat = c.flatten()
            if dtype is not None:
                flat = flat.cast(dtype)
            fixed = pa.FixedSizeListArray.from_arrays(flat, dim)
            return batch.set_column(
                batch.column_names.index(col), col, fixed
            )
        raise ValueError(f"cast_fixed_list: {col!r} is not a list column")

    return ds.map_batches(cast, batch_format="pyarrow")
