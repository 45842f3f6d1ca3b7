"""Distinct-count stages: exact set-union combiner and HyperLogLog.

The reference's distinct counts are exact np.unique calls on the whole
column (reference candidates/RawFeature.py:92). At scale, per-group
distinct counting must be a combiner, not a shuffle of every row:

- `distinct_exact`: per-batch (group -> unique-value set) partials,
  union-merged driver-side. Exact; memory O(total distinct values) on
  the driver — the right tool while that fits (tests, dimension keys).
- `distinct_hll`: HyperLogLog(p) register partials per group, merged by
  elementwise max — O(groups x 2^p bytes) regardless of cardinality,
  ~1.04/sqrt(2^p) relative error. The scale path.
- `grouped_median`: per-(batch, group) weighted-value sketch partials
  (stages/fit.py:_quant_partial — exact under 4096 distinct values per
  partial, rank-uniform compression above), merged driver-side into an
  exact-semantics weighted median per group.

Both do ZERO row shuffling: only tiny per-batch summaries reach the
driver.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

# HLL value-hash: wrapping pre-mix then a degree-2 polynomial, all mod
# 2^61-1, with PUBLIC constants so a SQL oracle can re-derive every
# register (same rationale as CMS_A/CMS_B below). The pre-mix
# multiplier sits near 2^60 so even tiny sequential ints wrap the
# modulus — a bare polynomial with small coefficients is MONOTONE on
# small x (no wrap), which concentrated every register index.
HLL_PREMIX = 1_152_921_504_606_846_883  # prime near 2^60
HLL_C2, HLL_C1, HLL_C0 = 998_244_353, 754_974_721, 167_772_161


def _hash61(values: np.ndarray) -> np.ndarray:
    """Replayable 61-bit hash: x1 = (x + C0)·PREMIX mod p, then
    h = (C2·x1² + C1·x1 + C0) mod p (p = 2^61-1). Integer inputs
    reduce mod p directly; anything else folds through the replayable
    Horner string hash first. Exact integer arithmetic end to end —
    an external engine reproduces it bit-for-bit."""
    from .text import _M61, _mulmod61, horner_mod61

    v = np.asarray(values)
    if v.dtype.kind in "iu":
        x = v.astype(np.uint64) % _M61
    else:
        x = horner_mod61([str(s) for s in v])
    ones = np.ones(len(x), np.uint64)
    x1 = _mulmod61((x + np.uint64(HLL_C0)) % _M61, ones * np.uint64(HLL_PREMIX))
    x2 = _mulmod61(x1, x1)
    h = (
        _mulmod61(x2, ones * np.uint64(HLL_C2))
        + _mulmod61(x1, ones * np.uint64(HLL_C1))
        + np.uint64(HLL_C0)
    )  # < 2^63, exact
    return h % _M61


def _group_indices(batch: pa.Table, key_cols: list[str]):
    keys = [batch[c].to_numpy(zero_copy_only=False) for c in key_cols]
    df = pd.DataFrame({i: k for i, k in enumerate(keys)})
    codes, uniques = pd.factorize(pd.MultiIndex.from_frame(df)) if len(key_cols) > 1 else pd.factorize(df[0])
    return codes, list(uniques)


def distinct_exact(ds, *, key_cols: list[str], value_col: str, out_col: str = "n_distinct") -> pd.DataFrame:
    """Exact per-group distinct count of value_col; combiner pattern."""

    def part(batch: pa.Table) -> pa.Table:
        codes, uniques = _group_indices(batch, key_cols)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        out = {}
        for g in range(len(uniques)):
            out[uniques[g]] = set(pd.unique(vals[codes == g]).tolist())
        return pa.table({"blob": pa.array([pickle.dumps(out)], type=pa.binary())})

    merged: dict = {}
    for row in ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all():
        for k, s in pickle.loads(row["blob"]).items():
            merged.setdefault(k, set()).update(s)
    rows = [(k, len(s)) for k, s in merged.items()]
    return _keyed_frame(rows, key_cols, [out_col])


def distinct_hll(
    ds, *, key_cols: list[str], value_col: str, p: int = 12, out_col: str = "n_distinct"
) -> pd.DataFrame:
    """Approximate per-group distinct count (HyperLogLog, 2^p registers)
    over the replayable 61-bit polynomial hash (_hash61): register index
    = top p bits, rank = leading zeros of the low (61-p) bits + 1. Every
    register (and therefore the estimate itself) is reproducible by an
    external engine, so the estimator is value-verifiable."""
    m = 1 << p
    rest_bits = 61 - p

    def part(batch: pa.Table) -> pa.Table:
        codes, uniques = _group_indices(batch, key_cols)
        h = _hash61(batch[value_col].to_numpy(zero_copy_only=False))
        reg_idx = (h >> np.uint64(rest_bits)).astype(np.int64)
        rest = h & np.uint64((1 << rest_bits) - 1)
        # rank = rest_bits - bit_length(rest) + 1 (capped when rest == 0)
        bl = np.zeros(len(h), dtype=np.int64)  # exact vectorized bit_length
        v = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            y = v >> np.uint64(s)
            has = y != 0
            bl[has] += s
            v = np.where(has, y, v)
        bl += (v != 0).astype(np.int64)
        nz = np.where(rest != 0, rest_bits - bl + 1, rest_bits + 1).astype(np.int64)
        out = {}
        for g in range(len(uniques)):
            sel = codes == g
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, reg_idx[sel], nz[sel].astype(np.int8))
            out[uniques[g]] = regs
        return pa.table({"blob": pa.array([pickle.dumps(out)], type=pa.binary())})

    merged: dict = {}
    for row in ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all():
        for k, regs in pickle.loads(row["blob"]).items():
            cur = merged.get(k)
            merged[k] = regs if cur is None else np.maximum(cur, regs)

    alpha = 0.7213 / (1 + 1.079 / m)
    rows = []
    for k, regs in merged.items():
        est = alpha * m * m / np.sum(2.0 ** (-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        rows.append((k, float(est)))
    return _keyed_frame(rows, key_cols, [out_col])


def _grouped_quant_parts(
    ds, key_cols: list[str], value_col: str, sketch_k: int | None = None
) -> dict:
    """Per-group mergeable weighted-value sketch partials (combiner
    pattern: only O(batches x groups x sketch_k) summary bytes leave
    the stream — no row shuffle). NaNs are skipped. Exact while each
    (batch, group) stays under sketch_k distinct values; rank error
    <= 1/sketch_k per partial beyond that."""
    from .fit import _quant_partial

    def part(batch: pa.Table) -> pa.Table:
        codes, uniques = _group_indices(batch, key_cols)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = {}
        for g in range(len(uniques)):
            pv = vals[codes == g]
            out[uniques[g]] = _quant_partial(pv[~np.isnan(pv)], sketch_k)
        return pa.table({"blob": pa.array([pickle.dumps(out)], type=pa.binary())})

    merged: dict = {}
    for row in ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all():
        for k, p_ in pickle.loads(row["blob"]).items():
            merged.setdefault(k, []).append(("quant",) + p_)
    return merged


def _keyed_frame(rows, key_cols, out_cols) -> pd.DataFrame:
    if len(key_cols) == 1:
        df = pd.DataFrame(rows, columns=[key_cols[0], *out_cols])
    else:
        df = pd.DataFrame([(*k, *v) for k, *v in rows], columns=[*key_cols, *out_cols])
    return df.sort_values(key_cols).reset_index(drop=True)


def grouped_median(
    ds, *, key_cols: list[str], value_col: str, out_col: str = "median"
) -> pd.DataFrame:
    """Exact-semantics per-group median via the mergeable weighted-value
    sketch. NaNs are skipped (np.nanmedian / SQL median semantics)."""
    from .fit import _merge_quant, _weighted_median

    merged = _grouped_quant_parts(ds, key_cols, value_col)
    rows = [(k, _weighted_median(*_merge_quant(parts))) for k, parts in merged.items()]
    return _keyed_frame(rows, key_cols, [out_col])


def grouped_quantile(
    ds,
    *,
    key_cols: list[str],
    value_col: str,
    q: float,
    out_col: str = "quantile",
    sketch_k: int | None = None,
    interpolate: bool = False,
) -> pd.DataFrame:
    """Per-group quantile via the same mergeable sketch — exact when
    per-partial distinct counts stay under the sketch cap, bounded rank
    error otherwise. Two SQL semantics:

    - interpolate=False: percentile_disc — the smallest value whose
      cumulative weight reaches q of the total.
    - interpolate=True: percentile_cont — linear interpolation between
      the order statistics at 0-based ranks floor(h) and ceil(h) with
      h = q*(N-1)."""
    from .fit import _merge_quant

    def disc(vals: np.ndarray, w: np.ndarray) -> float:
        return _disc_pick(vals, w, q)

    def cont(vals: np.ndarray, w: np.ndarray) -> float:
        if len(vals) == 0:
            return float("nan")
        cw = np.cumsum(w)
        h = q * (cw[-1] - 1.0)
        lo = vals[np.searchsorted(cw, np.floor(h), side="right")]
        hi = vals[np.searchsorted(cw, np.ceil(h), side="right")]
        return float(lo + (hi - lo) * (h - np.floor(h)))

    pick = cont if interpolate else disc
    merged = _grouped_quant_parts(ds, key_cols, value_col, sketch_k)
    rows = [(k, pick(*_merge_quant(parts))) for k, parts in merged.items()]
    return _keyed_frame(rows, key_cols, [out_col])


def grouped_quantiles(
    ds,
    *,
    key_cols: list[str],
    value_col: str,
    qs: list[float],
    out_cols: list[str],
    sketch_k: int | None = None,
) -> pd.DataFrame:
    """Several percentile_disc quantiles per group from ONE sketch pass
    (grouped_quantile above reruns the upstream pipeline per q — fine
    for a single quantile, wasteful for cutpoint ladders like CCNet's
    head/middle/tail terciles)."""
    from .fit import _merge_quant

    merged = _grouped_quant_parts(ds, key_cols, value_col, sketch_k)
    rows = []
    for k, parts in merged.items():
        vals, w = _merge_quant(parts)
        rows.append((k, *[_disc_pick(vals, w, q) for q in qs]))
    return _keyed_frame(rows, key_cols, out_cols)


def _disc_pick(vals: np.ndarray, w: np.ndarray, q: float) -> float:
    """percentile_disc over merged (value, weight) order statistics:
    the smallest value whose cumulative weight reaches q of the total.
    The ONE definition shared by grouped_quantile and grouped_quantiles
    so a boundary tweak can never desynchronize them."""
    if len(vals) == 0:
        return float("nan")
    cw = np.cumsum(w)
    return float(vals[np.searchsorted(cw, q * cw[-1], side="left")])


# the CMS pairwise hash family (a_d·H + b_d) mod 2^61-1 mod width:
# fixed public constants so a SQL oracle can replay the whole sketch
CMS_A = (1_000_003, 998_244_353, 754_974_721, 167_772_161)
CMS_B = (0, 1_000_000_007, 2_000_000_014, 3_000_000_021)


def cms_token_counts(
    ds,
    *,
    text_col: str = "text",
    query_tokens: list[str] | None = None,
    depth: int = 4,
    width: int = 1 << 14,
) -> pd.DataFrame:
    """Count-min sketch over whitespace tokens (Cormode & Muthukrishnan
    2005): per-batch depth x width counter partials merged by ADDITION
    (CMS is a linear sketch), so the exchange is O(depth x width) ints
    regardless of corpus size — the approximate-counting path where the
    exact vocabulary aggregate (top_tokens) stops fitting. Estimates
    only OVERCOUNT: true_n <= est <= true_n + eps * N with
    eps = e / width at probability 1 - (1/e)^depth.

    Returns (token, approx_n) for `query_tokens` (required: a CMS
    answers point queries, it does not enumerate)."""
    if not query_tokens:
        raise ValueError("cms_token_counts needs query_tokens")
    if depth > len(CMS_A):
        raise ValueError(f"depth <= {len(CMS_A)} (fixed hash family)")

    def _positions(tokens: np.ndarray) -> np.ndarray:
        # depth REPLAYABLE hash rows: affine (a_d·H + b_d) mod p over the
        # shared Horner word hash, then mod width — a pairwise family an
        # external engine can re-derive exactly (the old salted pandas
        # hash was engine-private, which forced a rows-only check)
        from .text import _M61, _mulmod61, horner_mod61

        h = horner_mod61(list(tokens))
        return np.stack([
            (
                ((_mulmod61(h, np.uint64(CMS_A[d])) + np.uint64(CMS_B[d])) % _M61)
                % np.uint64(width)
            ).astype(np.int64)
            for d in range(depth)
        ])

    def part(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist()).fillna("")
        ex = s.str.findall(r"\S+").explode().dropna()
        cms = np.zeros((depth, width), dtype=np.int64)
        if len(ex):
            # collapse to (unique token, count) first: add.at cost is
            # then vocab-sized, not corpus-sized
            vc = ex.value_counts()
            pos = _positions(vc.index.to_numpy(dtype=object))
            w = vc.to_numpy(np.int64)
            for d in range(depth):
                np.add.at(cms[d], pos[d], w)
        return pa.table({"blob": pa.array([pickle.dumps(cms)], type=pa.binary())})

    cms = np.zeros((depth, width), dtype=np.int64)
    for row in ds.map_batches(part, batch_format="pyarrow", batch_size=None).take_all():
        cms += pickle.loads(row["blob"])

    q = np.array(query_tokens, dtype=object)
    pos = _positions(q)
    est = np.min(
        np.stack([cms[d][pos[d]] for d in range(depth)]), axis=0
    )
    return pd.DataFrame({"token": query_tokens, "approx_n": est.astype(np.int64)})


# replayable MinHash permutation family: perm_d(s) = (A_d·s + B_d) mod p
# over the Horner shingle hash, A_d/B_d derived from public constants
MINHASH_A_BASE, MINHASH_B_BASE = 998_244_353, 167_772_161


def minhash_signatures_replayable(
    ds, *, text_col: str = "text", id_col: str = "doc_id",
    num_perm: int = 16, shingle_words: int = 3,
):
    """MinHash signatures whose every bit an external engine can
    re-derive: word shingles hash through the replayable Horner string
    hash, permutations are the affine family (A_d·s + B_d) mod 2^61-1
    with A_d = A·(d+1) mod p, B_d = B·d mod p. Output is LONG layout
    (id, perm, sig) — one row per signature slot. This value-verifies
    the minhash CORE that the LSH dedup family builds on (the dedup
    path itself keeps its tuned private hash; bucketing isn't
    SQL-expressible anyway). Row-local, zero exchange; per-perm mins
    are one minimum.reduceat over the shingle segments."""
    from .text import _M61, _mulmod61, horner_mod61

    p = int(_M61)
    A = np.array([(MINHASH_A_BASE * (d + 1)) % p for d in range(num_perm)], np.uint64)
    B = np.array([(MINHASH_B_BASE * d) % p for d in range(num_perm)], np.uint64)
    k = shingle_words - 1

    def sigs(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pandas()).fillna("")
        ex = s.str.findall(r"\S+").explode().dropna()
        empty = pa.table({
            id_col: pa.array([], type=batch[id_col].type),
            "perm": pa.array([], type=pa.int64()),
            "sig": pa.array([], type=pa.int64()),
        })
        if len(ex) <= k:
            return empty
        rows = ex.index.to_numpy(dtype=np.int64)
        words = ex.to_numpy(dtype="U")
        if k == 0:  # unigram shingles: every token is a shingle
            valid = np.ones(len(rows), dtype=bool)
            tg = words
        else:
            valid = rows[:-k] == rows[k:]
            tg = words[:-k]
            for j in range(1, shingle_words):
                tg = np.char.add(np.char.add(tg, " "), words[j:len(words) - k + j])
        if not valid.any():
            return empty
        srow = rows[: len(valid)][valid]
        sh = horner_mod61(list(tg[valid]))
        # contiguous segments per source row (explode preserves order)
        first = np.ones(len(srow), dtype=bool)
        first[1:] = srow[1:] != srow[:-1]
        starts = np.flatnonzero(first)
        urow = srow[starts]
        out_id, out_perm, out_sig = [], [], []
        ids_col = batch[id_col].take(pa.array(urow))
        for d in range(num_perm):
            hp = (_mulmod61(sh, np.full(len(sh), A[d], np.uint64))
                  + B[d]) % _M61
            mins = np.minimum.reduceat(hp, starts)
            out_id.append(ids_col)
            out_perm.append(pa.array(np.full(len(urow), d, np.int64)))
            out_sig.append(pa.array(mins.astype(np.int64)))
        return pa.table({
            id_col: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_id]),
            "perm": pa.concat_arrays(out_perm),
            "sig": pa.concat_arrays(out_sig),
        })

    return ds.map_batches(sigs, batch_format="pyarrow")


def simhash_replayable(
    ds, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 32,
):
    """SimHash signatures (Charikar 2002) whose every bit an external
    engine can re-derive: token hash = replayable Horner, bit j of the
    signature = sign of Σ_tokens (2·bit_j(h) − 1) with token
    multiplicity as the weight and ties (sum 0) resolving to 1.
    Returns (id, simhash) with the `bits` low bits packed into int64.
    Row-local, zero exchange; per-bit sums are `bits` bincounts over
    the flat token array."""
    from .text import flat_tokens_horner

    def sig(batch: pa.Table) -> pa.Table:
        n = len(batch)
        rows, h, counts = flat_tokens_horner(batch[text_col].to_pylist())
        packed = np.zeros(n, dtype=np.int64)
        if len(h):
            for j in range(bits):
                bj = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
                ones = np.bincount(rows, weights=bj, minlength=n).astype(np.int64)
                v = 2 * ones - counts  # Σ (2b-1)
                packed |= (v >= 0).astype(np.int64) << j
            packed[counts == 0] = 0
        return pa.table({id_col: batch[id_col], "simhash": pa.array(packed)})

    return ds.map_batches(sig, batch_format="pyarrow")


def winnow_fingerprints(
    ds, *, text_col: str = "text", id_col: str = "doc_id",
    shingle_words: int = 3, window: int = 4,
):
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): the MINIMUM shingle hash of every sliding window of
    `window` consecutive shingles, deduplicated per document — the
    guarantee is that any match of at least window+shingle-1 words
    shares a fingerprint. Hashes are the replayable Horner family, so
    every selected print is SQL-re-derivable. Returns the per-doc print
    summary (count / min / max / xor — xor is order-insensitive and
    cannot overflow, unlike a sum of 61-bit values). Row-local, zero
    exchange; the sliding min is a numpy minimum over `window` shifted
    views. Docs with fewer than window+shingle-1 words emit nothing."""
    from .text import horner_mod61

    k = shingle_words - 1

    def prints(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pandas()).fillna("")
        ex = s.str.findall(r"\S+").explode().dropna()
        empty = pa.table({
            id_col: pa.array([], type=batch[id_col].type),
            "n_prints": pa.array([], type=pa.int64()),
            "min_fp": pa.array([], type=pa.int64()),
            "max_fp": pa.array([], type=pa.int64()),
            "xor_fp": pa.array([], type=pa.int64()),
        })
        if len(ex) <= k:
            return empty
        rows = ex.index.to_numpy(dtype=np.int64)
        words = ex.to_numpy(dtype="U")
        valid = rows[:-k] == rows[k:] if k else np.ones(len(rows), bool)
        if not valid.any():
            return empty
        tg = words[:-k] if k else words
        for j in range(1, shingle_words):
            tg = np.char.add(np.char.add(tg, " "), words[j:len(words) - k + j])
        srow = rows[: len(valid)][valid]
        sh = horner_mod61(list(tg[valid]))
        w = window
        if len(sh) < w:
            return empty
        # sliding min over `w` shifted views; a window is in-doc iff its
        # first and last shingles share the row
        m = sh[w - 1:].copy()
        for j in range(1, w):
            np.minimum(m, sh[w - 1 - j: len(sh) - j], out=m)
        wrow = srow[w - 1:]
        in_doc = srow[: len(sh) - w + 1] == wrow
        if not in_doc.any():
            return empty
        df = pd.DataFrame({"r": wrow[in_doc], "m": m[in_doc].astype(np.int64)})
        sel = df.drop_duplicates()
        agg = sel.groupby("r").agg(
            n_prints=("m", "size"), min_fp=("m", "min"), max_fp=("m", "max"),
            xor_fp=("m", lambda v: np.bitwise_xor.reduce(v.to_numpy(np.int64))),
        ).reset_index()
        return pa.table({
            id_col: batch[id_col].take(pa.array(agg["r"].to_numpy())),
            "n_prints": pa.array(agg["n_prints"].to_numpy(np.int64)),
            "min_fp": pa.array(agg["min_fp"].to_numpy(np.int64)),
            "max_fp": pa.array(agg["max_fp"].to_numpy(np.int64)),
            "xor_fp": pa.array(agg["xor_fp"].to_numpy(np.int64)),
        })

    return ds.map_batches(prints, batch_format="pyarrow")
