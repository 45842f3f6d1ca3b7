"""Count-based n-gram language-model quality scoring (CCNet shape).

CCNet / the Llama data pipeline scores every document with a small LM
trained on a trusted corpus and filters by perplexity bucket. The
engine's variant is a bigram model with add-alpha smoothing:

    p(w2 | w1) = (c(w1 w2) + a) / (c(w1) + a * V)

fit on a Dataset in one streaming pass (per-batch partial counts ->
one Ray hash aggregate over distinct n-grams) and applied in a second
streaming pass with the model broadcast once via ``ray.put``.

Scale assumptions, stated: the MODEL is bounded (a quality LM's vocab
doesn't grow with the corpus being scored — CCNet's is fixed Wikipedia;
``min_count`` prunes the tail to enforce this), so broadcasting sorted
hash arrays + counts is the right join strategy; both corpus passes
stream with only O(distinct n-grams) leaving the aggregate. Word
n-grams reuse the vectorized shingle kernel from ``dedup`` (one explode
+ shifted vector mixes, no per-row Python).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .dedup import _shingle_hashes

__all__ = ["BigramLM", "fit_bigram_lm", "score_bigram_lm"]

_U64 = np.uint64


@dataclass
class BigramLM:
    """Sorted-hash count tables (the broadcastable model)."""

    bi_keys: np.ndarray  # sorted uint64 bigram hashes
    bi_counts: np.ndarray  # int64
    uni_keys: np.ndarray  # sorted uint64 unigram hashes
    uni_counts: np.ndarray  # int64 (token occurrences)
    vocab: int  # V = number of distinct unigrams
    alpha: float = 0.5


def _partial_counts(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    sh, _ = _shingle_hashes(texts, k)
    if len(sh) == 0:
        return np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64)
    keys, counts = np.unique(sh, return_counts=True)
    return keys, counts.astype(np.int64)


def fit_bigram_lm(ds, *, text_col: str = "text", alpha: float = 0.5, min_count: int = 1) -> BigramLM:
    """One streaming pass: per-batch distinct (kind, hash) partials ->
    Ray Sum aggregate -> driver-side sorted model arrays (O(vocab))."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        uk, uc = _partial_counts(texts, 1)
        bk, bc = _partial_counts(texts, 2)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(len(uk), np.int64), np.ones(len(bk), np.int64)]
                    )
                ),
                "k": pa.array(np.concatenate([uk, bk]).view(np.int64)),
                "c": pa.array(np.concatenate([uc, bc])),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["kind", "k"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    kind = np.fromiter((r["kind"] for r in rows), dtype=np.int64, count=len(rows))
    keys = np.fromiter((r["k"] for r in rows), dtype=np.int64, count=len(rows)).view(_U64)
    counts = np.fromiter((r["c"] for r in rows), dtype=np.int64, count=len(rows))

    def table(which: int):
        m = (kind == which) & (counts >= min_count)
        k, c = keys[m], counts[m]
        o = np.argsort(k)
        return k[o], c[o]

    uni_k, uni_c = table(0)
    bi_k, bi_c = table(1)
    return BigramLM(bi_k, bi_c, uni_k, uni_c, vocab=len(uni_k), alpha=alpha)


def _probe(sorted_keys: np.ndarray, sorted_counts: np.ndarray, q: np.ndarray) -> np.ndarray:
    """counts for queried hashes; 0 where unseen."""
    out = np.zeros(len(q), dtype=np.int64)
    if len(sorted_keys) == 0 or len(q) == 0:
        return out
    idx = np.searchsorted(sorted_keys, q)
    ok = idx < len(sorted_keys)
    hit = np.zeros(len(q), dtype=bool)
    hit[ok] = sorted_keys[idx[ok]] == q[ok]
    out[hit] = sorted_counts[idx[hit]]
    return out


def score_bigram_lm(
    ds,
    lm: BigramLM,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
):
    """Streaming scoring pass: broadcast the model once, probe each
    batch's n-gram hashes with searchsorted, segment-sum the per-bigram
    negative log-likelihoods with np.add.reduceat. Emits one row per
    document that has >= 1 bigram: (id, n_bigrams, avg_nll)."""
    import ray

    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        m: BigramLM = ray.get(lm_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bi, offsets = _shingle_hashes(texts, 2)
        uni, uoff = _shingle_hashes(texts, 1)
        n_bi = np.diff(offsets)
        if len(bi) == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "avg_nll": pa.array([], type=pa.float64()),
                }
            )
        # context (w1) hashes: drop each row's LAST unigram position
        n_uni = np.diff(uoff)
        keep = np.ones(len(uni), dtype=bool)
        keep[uoff[1:][n_uni > 0] - 1] = False
        ctx = uni[keep]
        cb = _probe(m.bi_keys, m.bi_counts, bi).astype(np.float64)
        cw = _probe(m.uni_keys, m.uni_counts, ctx).astype(np.float64)
        nll = np.log(cw + m.alpha * m.vocab) - np.log(cb + m.alpha)
        sums = np.add.reduceat(nll, offsets[:-1][n_bi > 0])
        rows = n_bi > 0
        return pa.table(
            {
                id_col: pa.array(ids[rows]),
                "n_bigrams": pa.array(n_bi[rows]),
                "avg_nll": pa.array(np.round(sums / n_bi[rows], ndigits)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


@dataclass
class TrigramLM:
    """Sorted-hash count tables for stupid-backoff scoring."""

    tri_keys: np.ndarray
    tri_counts: np.ndarray
    bi_keys: np.ndarray
    bi_counts: np.ndarray
    uni_keys: np.ndarray
    uni_counts: np.ndarray
    total: int  # N = total token occurrences
    backoff: float = 0.4


def fit_trigram_lm(ds, *, text_col: str = "text", backoff: float = 0.4, min_count: int = 1) -> TrigramLM:
    """One streaming pass (per-batch distinct (kind, hash) partials ->
    Ray Sum aggregate) extending the bigram fit with the trigram table;
    model stays O(distinct n-grams) — the bounded-vocab assumption of
    the module docstring applies."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        parts = [_partial_counts(texts, k) for k in (1, 2, 3)]
        kinds = np.concatenate(
            [np.full(len(p[0]), i, dtype=np.int64) for i, p in enumerate(parts)]
        )
        return pa.table(
            {
                "kind": pa.array(kinds),
                "k": pa.array(np.concatenate([p[0] for p in parts]).view(np.int64)),
                "c": pa.array(np.concatenate([p[1] for p in parts])),
            }
        )

    rows = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["kind", "k"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    kind = np.fromiter((r["kind"] for r in rows), dtype=np.int64, count=len(rows))
    keys = np.fromiter((r["k"] for r in rows), dtype=np.int64, count=len(rows)).view(_U64)
    counts = np.fromiter((r["c"] for r in rows), dtype=np.int64, count=len(rows))

    def table(which: int):
        m = (kind == which) & (counts >= min_count)
        k, c = keys[m], counts[m]
        o = np.argsort(k)
        return k[o], c[o]

    uni_k, uni_c = table(0)
    bi_k, bi_c = table(1)
    tri_k, tri_c = table(2)
    total = int(counts[kind == 0].sum())
    return TrigramLM(tri_k, tri_c, bi_k, bi_c, uni_k, uni_c, total, backoff)


def score_trigram_lm(
    ds,
    lm: TrigramLM,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
):
    """Stupid-backoff scoring (Brants et al. 2007): per trigram
    occurrence S = c123/c12, backing off to 0.4·c23/c2, then to
    0.4²·c3/N. Streaming: model broadcast once, every probe a
    searchsorted over the sorted hash tables, per-doc segment mean via
    np.add.reduceat. Emits (id, n_trigrams, avg_nll) for docs with
    >= 1 trigram."""
    import ray

    lm_ref = ray.put(lm)

    def _within_layout(n_vals, seg_counts, want):
        """(within-segment index, per-element want) for one flat layout —
        computed ONCE per (bigram, unigram) layout and reused for every
        lo offset, instead of rebuilding the O(total-tokens) temporaries
        per probe."""
        starts = np.zeros(len(seg_counts), dtype=np.int64)
        np.cumsum(seg_counts[:-1], out=starts[1:])
        within = np.arange(n_vals, dtype=np.int64) - np.repeat(starts, seg_counts)
        return within, np.repeat(want, seg_counts)

    def _segment_select(vals, within, w, lo):
        """Elements of each row segment with within-index in [lo, lo+want)."""
        return vals[(within >= lo) & (within < lo + w)]

    def score(batch: pa.Table) -> pa.Table:
        m: TrigramLM = ray.get(lm_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uni, uoff = _shingle_hashes(texts, 1)
        bi, boff = _shingle_hashes(texts, 2)
        tri, toff = _shingle_hashes(texts, 3)
        nt = np.diff(toff)
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_trigrams": pa.array([], type=pa.int64()),
                "avg_nll": pa.array([], type=pa.float64()),
            }
        )
        if len(tri) == 0:
            return empty
        nb, nu = np.diff(boff), np.diff(uoff)
        bw, bwant = _within_layout(len(bi), nb, nt)
        uw, uwant = _within_layout(len(uni), nu, nt)
        c123 = _probe(m.tri_keys, m.tri_counts, tri).astype(np.float64)
        c12 = _probe(
            m.bi_keys, m.bi_counts, _segment_select(bi, bw, bwant, 0)
        ).astype(np.float64)
        c23 = _probe(
            m.bi_keys, m.bi_counts, _segment_select(bi, bw, bwant, 1)
        ).astype(np.float64)
        c2 = _probe(
            m.uni_keys, m.uni_counts, _segment_select(uni, uw, uwant, 1)
        ).astype(np.float64)
        c3 = _probe(
            m.uni_keys, m.uni_counts, _segment_select(uni, uw, uwant, 2)
        ).astype(np.float64)
        b = m.backoff
        with np.errstate(divide="ignore", invalid="ignore"):
            s3 = np.where(c2 > 0, c23 / np.maximum(c2, 1), 0.0)
            s = np.where(
                (c123 > 0) & (c12 > 0),
                c123 / np.maximum(c12, 1),
                np.where(c23 > 0, b * s3, b * b * c3 / max(m.total, 1)),
            )
        nll = -np.log(np.maximum(s, 1e-300))
        sums = np.add.reduceat(nll, toff[:-1][nt > 0])
        rows = nt > 0
        return pa.table(
            {
                id_col: pa.array(ids[rows]),
                "n_trigrams": pa.array(nt[rows]),
                "avg_nll": pa.array(np.round(sums / nt[rows], ndigits)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
