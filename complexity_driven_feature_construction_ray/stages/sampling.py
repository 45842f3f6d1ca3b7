"""Deterministic sampling stages for training-data mixture construction.

A 100 TB corpus is rarely trained on as-is: sources are re-weighted
(DoReMi / The Pile style mixture rates), and the sample must be
DETERMINISTIC so a resumed or re-sharded run keeps exactly the same
rows. Both ops here decide per row from a multiplicative hash of the
row's own key — no RNG state, no cross-row coordination, no shuffle —
so they run as pure `map_batches` filters at any scale and any
partitioning, and the exact same predicate is expressible in SQL for
the DuckDB oracle.

Reference anchor: the reference's Splitter/RandomSplitter
(new_project/fastsklearnfeature/splitting/Splitter.py) does seeded
row sampling on in-memory frames; these stages are the corpus-scale
equivalents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Knuth multiplicative constant; the hash must stay reproducible in
# ANSI SQL (64-bit exact product, then mod 2^32), so no avalanche mixer.
_KNUTH = 2654435761
_M32 = 1 << 32


def det_hash_u32(keys: np.ndarray, seed: int = 17) -> np.ndarray:
    """(key * M_seed + seed) mod 2^32 with M_seed = (2654435761 *
    (2*seed+1)) mod 2^32 — identical to the SQL expression with M_seed
    inlined as a constant, as long as the exact product fits an int64
    (key < ~3.4e9, i.e. any realistic id space after sharding; shard
    ids locally when beyond). The seed must change the MULTIPLIER, and
    by a large factor: an additive-only seed just translates every
    hash (each seed's sorted permutation is a rotation of one
    sequence), and multipliers differing by a small delta barely
    perturb the Weyl ordering of small key sets. M_seed stays odd, so
    the map remains a bijection mod 2^32."""
    k = np.asarray(keys).astype(np.uint64)
    mult = np.uint64((_KNUTH * (2 * seed + 1)) % _M32)
    return ((k * mult + np.uint64(seed)) % np.uint64(_M32)).astype(np.uint64)


def mixture_sample(
    ds,
    rates: dict[str, float],
    *,
    key_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 17,
    denom: int = 10_000,
):
    """Per-source deterministic Bernoulli sampling: keep a row iff
    hash(key) % denom < rates[source] * denom. Groups absent from
    `rates` are dropped (rate 0). Pure streaming filter — one
    map_batches, no shuffle, no driver state; resumable because the
    decision depends only on the row."""
    thresholds = {g: int(round(r * denom)) for g, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        h = (det_hash_u32(keys, seed) % np.uint64(denom)).astype(np.int64)
        thr = (
            pd.Series(batch[group_col].to_pandas())
            .map(thresholds)
            .fillna(0)
            .to_numpy(dtype=np.int64)
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def deterministic_shuffle_key(
    ds, *, key_col: str = "doc_id", seed: int = 29, out_col: str = "__shuffle_key"
):
    """Attach a deterministic pseudo-random sort key. A global
    `sort(out_col)` then yields a seeded full shuffle of the corpus
    (the training-output ordering pass) that is REPRODUCIBLE across
    runs and cluster sizes — unlike `random_shuffle`, whose layout
    depends on block boundaries. The sort is the one unavoidable
    all-to-all; everything before it streams."""

    def add_key(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(det_hash_u32(keys, seed).astype(np.int64))
        )

    return ds.map_batches(add_key, batch_format="pyarrow")


def grouped_topn(
    ds,
    *,
    key_col: str,
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak_col: str | None = None,
):
    """Top-n rows per group ("keep the best n documents per source"),
    deterministic: order by (order_col, tiebreak_col) with the
    tiebreak always ascending.

    Scale shape: every batch FIRST reduces itself to its own local
    top-n per group (a vectorized sort + groupby-head combiner), so
    the per-group exchange moves at most n rows per (batch, group) —
    never the corpus. The final per-group head runs on survivors only.
    Skewed groups are bounded the same way: a hot group contributes n
    rows per upstream batch, not its full membership."""
    import pandas as pd

    by = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    asc = [not descending] + ([True] if tiebreak_col else [])

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        return (
            batch.sort_values(by, ascending=asc, kind="stable")
            .groupby(key_col, sort=False)
            .head(n)
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return local(g)

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby(key_col)
        .map_groups(finish, batch_format="pandas")
    )


def weighted_sample(ds, k: int, *, weight_col: str, key_col: str = "doc_id", seed: int = 23):
    """Efraimidis–Spirakis A-Res weighted sampling WITHOUT replacement:
    each row gets key = ln(u)/w with u = (det_hash_u32(id)+0.5)/2^32,
    and the sample is the global top-k by key (monotone in the paper's
    u^(1/w); inclusion probability proportional to weight). Keys are
    row-local and deterministic, so the heavy stream pays only a
    per-block top-k prefilter — at most k rows per block reach the tiny
    global sort — and the draw is reproducible across runs, cluster
    sizes and resumes. Rows with non-positive weight are excluded."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch[key_col].to_numpy()
        w = batch[weight_col].to_numpy().astype(np.float64)
        u = (det_hash_u32(ids, seed).astype(np.float64) + 0.5) / float(1 << 32)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log(u) / w
        key = np.where(w > 0, key, -np.inf)
        t = batch.append_column("__ares", pa.array(key))
        finite = np.isfinite(key)
        if not finite.all():
            t = t.filter(pa.array(finite))
            key = key[finite]
        if len(t) > k:
            idx = np.argpartition(key, -k)[-k:]
            t = t.take(pa.array(np.sort(idx)))
        return t

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .sort("__ares", descending=True)
        .limit(k)
    )
