"""Text-analysis stages over a `documents(doc_id, text, ...)` table.

Large-scale training-data curation ops (beyond the reference's scope,
first-class here): token counting, quality scoring, n-gram-heuristic
language ID, and rolling-hash document fingerprinting. All are
stateless vectorized map_batches stages; the language-ID stage is a
callable class (actor pool) because its per-language stopword tables
and regexes are built once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")

# compact stopword tables for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "que", "dans", "des", "du"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "para", "que", "en", "del", "por"},
}

_MOD = np.uint64((1 << 61) - 1)
_POLY = np.uint64(1_000_003)


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish sub-word count (runs of word
    chars / digits / single punctuation, the GPT-2-style pre-tokenizer
    shape)."""
    s = pd.Series(batch[text_col].to_pandas())
    n_ws = s.str.split(_WS).map(lambda w: sum(1 for x in w if x))
    n_bpe = s.str.count(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
    out = batch.append_column("n_tokens_ws", pa.array(n_ws.to_numpy(dtype=np.int64)))
    return out.append_column("n_tokens_bpe", pa.array(n_bpe.to_numpy(dtype=np.int64)))


def quality_scores(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / digit / stopword-ratio quality signals."""
    s = pd.Series(batch[text_col].to_pandas()).fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    n_words = s.str.count(r"\S+").to_numpy(dtype=np.int64)
    n_punct = s.str.count(r"[.,;:!?]").to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"[0-9]").to_numpy(dtype=np.int64)
    words = s.str.lower().str.findall(r"[a-z]+")
    stop = _LANG_MARKERS["en"]
    stop_ratio = words.map(
        lambda ws: sum(1 for w in ws if w in stop) / len(ws) if ws else 0.0
    ).to_numpy(dtype=np.float64)
    safe = np.maximum(n_chars, 1)
    mean_word_len = n_chars / np.maximum(n_words, 1)
    batch = batch.append_column("n_words", pa.array(n_words))
    batch = batch.append_column("punct_ratio", pa.array(n_punct / safe))
    batch = batch.append_column("digit_ratio", pa.array(n_digit / safe))
    batch = batch.append_column("stopword_ratio", pa.array(stop_ratio))
    batch = batch.append_column("mean_word_len", pa.array(mean_word_len))
    return batch


class LanguageId:
    """Actor-pool stage: stopword-overlap language scorer.

    Tables/regexes compile once per actor (__init__), work per batch."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = []
        for t in texts:
            t = (t or "").lower()
            if self.cjk.search(t):
                langs.append("zh")
                continue
            words = self.word_re.findall(t)
            best, best_n = "en", -1
            for lang, stops in self.markers.items():
                n = sum(1 for w in words if w in stops)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best)
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Order-sensitive rolling polynomial hash over word hashes mod 2^61-1."""
    s = pd.Series(batch[text_col].to_pandas()).fillna("")
    words = s.str.split(_WS)
    fps = np.empty(len(s), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, ws in enumerate(words):
            h = np.uint64(0)
            hv = pd.util.hash_array(np.array([w for w in ws if w], dtype=object))
            for x in hv.astype(np.uint64):
                h = (h * _POLY + x) % _MOD
            fps[i] = h
    return batch.append_column("fingerprint", pa.array(fps.astype(np.int64)))


def text_analysis_dataset(ds, *, lang_concurrency: int = 4):
    """token counts + quality + language id + fingerprint, one pipeline."""
    return (
        ds.map_batches(token_counts, batch_format="pyarrow")
        .map_batches(quality_scores, batch_format="pyarrow")
        .map_batches(LanguageId, batch_format="pyarrow", concurrency=lang_concurrency)
        .map_batches(fingerprint, batch_format="pyarrow")
    )
