"""Deterministic synthetic token-table generator (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    doc_id:string, tokens:list<int32>, n_tok:int32, source:string
plus the derived time axis and a learnable label needed by the search:
    ingest_ts:timestamp[us], label:int8

Every row is a pure function of (seed, row index) via a counter-based
splitmix64 PRNG — any row is independently reproducible on any worker,
which is what makes distributed generation, resume tests, and the
allclose oracle possible (the reference leaks nondeterminism instead:
unseeded sampling in new_project/fairexp.py:94; we are seeded
end-to-end by design, see SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOKEN_TABLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("ingest_ts", pa.timestamp("us")),
        ("label", pa.int8()),
    ]
)

VOCAB = 50257
MAX_TOK = 512
SOURCES = np.array(["web", "books", "code", "wiki", "chat"])
# Zipfian weights 0.55/0.2/0.12/0.08/0.05 (skewed on purpose — exercises salting)
_SOURCE_CUM = np.array([0.55, 0.75, 0.87, 0.95, 1.01])
_BASE_EPOCH_US = np.int64(1735689600_000_000)  # 2025-01-01T00:00:00Z
_SPAN_US = np.int64(30 * 86400) * np.int64(1_000_000)  # 30 days

_U64 = np.uint64
_GOLD = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a counter-based hash usable as a PRNG."""
    x = (x + _GOLD).astype(_U64)
    x = (x ^ (x >> _U64(30))) * _M1
    x = (x ^ (x >> _U64(27))) * _M2
    return x ^ (x >> _U64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    """uint64 hash -> float64 uniform in [0, 1)."""
    return (x >> _U64(11)).astype(np.float64) * (2.0**-53)


def _row_stream(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """Independent u64 per (seed, row, stream)."""
    with np.errstate(over="ignore"):
        s = _mix64(np.full(1, _U64(seed) * _GOLD + _U64(stream)))[0]
        return _mix64(idx.astype(_U64) * _M1 + s)


def generate_batch(idx: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate token-table rows for the given global row indices."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)

    # n_tok: log-uniform (Zipf-ish heavy tail) clipped to [1, MAX_TOK]
    u_len = _uniform(_row_stream(seed, idx, 1))
    n_tok = np.clip(np.round(2.0 ** (u_len * 9.0)), 1, MAX_TOK).astype(np.int32)

    # tokens: per (row, slot) counter-based draw in [0, VOCAB)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    slot = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_tok)
    row_key = _row_stream(seed, idx, 2)
    tok_hash = _mix64(row_key[row_of] ^ _mix64(slot.astype(_U64) + _GOLD))
    tokens = (tok_hash % _U64(VOCAB)).astype(np.int32)
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(tokens, type=pa.int32())
    )

    # source: skewed categorical
    u_src = _uniform(_row_stream(seed, idx, 3))
    src_idx = np.searchsorted(_SOURCE_CUM, u_src, side="right")
    source = SOURCES[src_idx]

    # ingest_ts: base epoch + uniform offset within the 30-day window
    u_ts = _uniform(_row_stream(seed, idx, 4))
    ts = _BASE_EPOCH_US + (u_ts * float(_SPAN_US)).astype(np.int64)

    # label: learnable deterministic function of (token stats, source) + noise
    # so the complexity-driven search has signal to find (FIXTURES.md F7).
    sums = np.add.reduceat(tokens.astype(np.float64), offsets[:-1])
    tok_mean = sums / n_tok
    src_eff = np.array([0.6, -0.4, 1.0, -0.8, 0.0])[src_idx]
    u_noise = _uniform(_row_stream(seed, idx, 5))
    logit = (
        2.5 * (tok_mean / VOCAB - 0.5)
        + 0.012 * (n_tok.astype(np.float64) - 80.0)
        + src_eff
        + 1.5 * (u_noise - 0.5)
    )
    label = (logit > 0.0).astype(np.int8)

    doc_id = pa.array([f"doc-{i:012d}" for i in idx], type=pa.string())
    return pa.Table.from_arrays(
        [
            doc_id,
            tokens_arr,
            pa.array(n_tok, type=pa.int32()),
            pa.array(source, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(label, type=pa.int8()),
        ],
        schema=TOKEN_TABLE_SCHEMA,
    )


def token_table_arrow(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Driver-side generation (tests / small fixtures only)."""
    return generate_batch(np.arange(start, start + n_rows, dtype=np.int64), seed)


# Rows per generated block: ~50k rows x (mean ~56 tokens x 4 B + stat
# floats) ~= 15-20 MiB — small enough that every stage pipelines across
# all CPUs, big enough to amortize per-task overhead. Ray's own default
# for range(10M) is ~77 fat blocks, which serializes the heavy per-block
# generate+backfill work (measured 4x slower at 10M rows / 32 CPUs).
TARGET_ROWS_PER_BLOCK = 50_000


def token_table_dataset(n_rows: int, seed: int = 42, *, override_num_blocks: int | None = None):
    """Distributed generation as a Ray Dataset (the scale path).

    `ray.data.range(n)` provides the row indices; generation happens
    inside map_batches so no tokens ever pass through the driver.
    Block count defaults to DATA-SIZED (rows / TARGET_ROWS_PER_BLOCK,
    CPU count as a parallelism floor).
    """
    import ray.data

    if override_num_blocks is None:
        from ..stages.bucketing import data_sized_buckets

        override_num_blocks = data_sized_buckets(
            n_rows, target_rows=TARGET_ROWS_PER_BLOCK
        )
    ds = ray.data.range(n_rows, override_num_blocks=override_num_blocks)

    def _gen(batch: pa.Table) -> pa.Table:
        return generate_batch(batch.column("id").to_numpy(), seed)

    # batch_size=None => one batch per block: the generator is fully
    # vectorized, so bigger batches amortize per-call overhead
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=None)


def write_token_table(
    path: str, n_rows: int, seed: int = 42, num_files: int | None = None
) -> str:
    """Materialize the synthetic table as a directory of Parquet files.

    One file per block — the shard layout the resumable backfill keys on.
    """
    ds = token_table_dataset(n_rows, seed, override_num_blocks=num_files)
    ds.write_parquet(path)
    return path
