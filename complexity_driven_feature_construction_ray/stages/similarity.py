"""Approximate-nearest-neighbor search over an embedding column.

- `knn_bruteforce`: exact cosine top-k. The query matrix is broadcast
  (ray.put once, read in every task); each batch does one numpy matmul
  and emits only its local top-k per query (partial top-k combiner), so
  the groupby(query) shuffle moves k rows per (query, batch), never the
  embeddings.
- `knn_ivf`: the scale path — coarse k-means centroids fit on a seeded
  driver-side sample, every batch assigns its vectors to centroids and
  only batches' vectors in each query's `nprobe` nearest cells are
  scored. Same output contract; recall < 1 by design.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowutil import list_column_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_df(qids, ids, scores, k) -> pd.DataFrame:
    df = pd.DataFrame({"query_id": qids, "id": ids, "score": scores})
    df = df.sort_values(["query_id", "score", "id"], ascending=[True, False, True], kind="stable")
    return df.groupby("query_id", sort=False).head(k).reset_index(drop=True)


def knn_bruteforce(
    ds,
    queries: np.ndarray,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k: returns (query_id, rank, id, score).

    Ties on score break by ascending id (stable, SQL-reproducible)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        embs = _normalize(list_column_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = embs @ q.T  # (n, nq)
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        nq = sims.shape[1]
        out_q = np.repeat(qids, kk)
        out_i = ids[top.T.reshape(-1)]
        out_s = sims[top.T.reshape(-1), np.repeat(np.arange(nq), kk)]
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "id": pa.array(out_i),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ centers.T, axis=1)  # cosine on normalized data
        for c in range(len(centers)):
            m = assign == c
            if m.any():
                centers[c] = sample[m].mean(axis=0)
        centers = _normalize(centers)
    return centers


def knn_ivf(
    ds,
    queries: np.ndarray,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2000,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-style ANN: centroids from a seeded sample; per batch only the
    vectors assigned to each query's nprobe nearest cells are scored."""
    import ray

    sample_rows = ds.random_sample(1.0, seed=seed).limit(sample_size).take_all()
    sample = _normalize(np.stack([r[emb_col] for r in sample_rows]).astype(np.float64))
    centers = _kmeans(sample, n_clusters, seed=seed)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ centers.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    q_ref = ray.put((qn, centers, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        q, cent, prb = ray.get(q_ref)
        embs = _normalize(list_column_matrix(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cell = np.argmax(embs @ cent.T, axis=1)
        rows_q, rows_i, rows_s = [], [], []
        for qi in range(len(q)):
            mask = np.isin(cell, prb[qi])
            if not mask.any():
                continue
            sims = embs[mask] @ q[qi]
            sel_ids = ids[mask]
            kk = min(k, len(sel_ids))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_i.append(sel_ids[top])
            rows_s.append(sims[top])
        if not rows_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "id": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "id": pa.array(np.concatenate(rows_i)),
                "score": pa.array(np.concatenate(rows_s), type=pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
