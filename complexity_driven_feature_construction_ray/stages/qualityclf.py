"""Model-based quality scoring: a hashed bag-of-words linear classifier
(the CCNet / fastText-style "does this look like wiki/books?" filter
used to curate web corpora) trained driver-side on a small labeled
sample and applied to the whole corpus as a broadcast-weights
map_batches stage.

Scale shape: training sees only a driver-sized sample (as in CCNet,
where the classifier is a fixed artifact); scoring broadcasts one
(n_features+1) float32 weight vector via ray.put and streams the
corpus through a fully vectorized featurize → matvec → sigmoid pass.
No shuffle, no per-row Python.

Reference anchor: the reference scores candidate features with its own
numpy logistic regression (pipelines/model.py here mirrors
new_project/fastsklearnfeature/candidates/CandidateFeature evaluation);
this stage reuses that trainer for a corpus-curation model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _flat_words


def hashed_bow(texts: list[str], n_features: int = 1024) -> np.ndarray:
    """Dense (n_rows, n_features) log-scaled term-count matrix via the
    hashing trick — one explode + one vectorized hash, no per-row loop.
    n_features stays small because the Newton trainer solves a dense
    (F+1)² system; the scorer itself would take any width."""
    wh, counts = _flat_words(texts)
    n = len(texts)
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    cols = (wh % np.uint64(n_features)).astype(np.int64)
    flat = np.bincount(rows * n_features + cols, minlength=n * n_features)
    M = flat.reshape(n, n_features).astype(np.float32)
    np.log1p(M, out=M)
    return M


def train_quality_classifier(
    texts: list[str],
    labels: np.ndarray,
    *,
    n_features: int = 1024,
    C: float = 1.0,
    max_iter: int = 25,
) -> np.ndarray:
    """Fit the binary L2 logistic model on hashed-BoW features; returns
    the (n_features+1) weight vector (bias last). Deterministic: the
    Newton solve has no random state."""
    from ..pipelines.model import LogisticRegressionNumpy

    X = hashed_bow(texts, n_features)
    y = np.asarray(labels, dtype=np.float64)
    lr = LogisticRegressionNumpy(C=C, max_iter=max_iter).fit(X.astype(np.float64), y)
    return lr.coef_.astype(np.float32)


class QualityClassifierScorer:
    """Actor-pool scoring stage: weights fetched from the object store
    once per actor in __init__ (zero-copy numpy view), batches scored
    with one matvec. Pass to map_batches(..., concurrency=N)."""

    def __init__(self, weights_ref, *, text_col: str = "text", out_col: str = "quality_prob"):
        import ray

        w = ray.get(weights_ref) if not isinstance(weights_ref, np.ndarray) else weights_ref
        self.w = np.asarray(w, dtype=np.float32)
        self.n_features = len(self.w) - 1
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[self.text_col].to_pandas()).fillna("").tolist()
        M = hashed_bow(texts, self.n_features)
        z = np.clip(M @ self.w[:-1] + self.w[-1], -35, 35).astype(np.float64)
        p = 1.0 / (1.0 + np.exp(-z))
        return batch.append_column(self.out_col, pa.array(np.round(p, 6)))


def score_quality(ds, weights: np.ndarray, *, text_col: str = "text", concurrency: int = 4):
    """Attach quality_prob to every row of a documents Dataset."""
    import ray

    ref = ray.put(np.asarray(weights, dtype=np.float32))
    return ds.map_batches(
        QualityClassifierScorer,
        fn_constructor_kwargs={"weights_ref": ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
