"""Distributed embedding-matrix operators: PCA and Lloyd k-means.

Both follow the classic two-phase distributed-ML shape (the Spark
MLlib pattern, re-expressed on Ray Data):

- a STATISTICS pass streams the corpus through `map_batches`, each
  batch emitting a tiny mergeable partial (count / sum / X'X, or
  per-cluster sums) — only O(batches × d²) bytes leave the stream;
- the DRIVER combines the partials and solves the small dense problem
  (eigendecomposition / centroid update);
- an APPLY pass broadcasts the model via `ray.put` and streams the
  corpus again (projection / assignment), zero-copy per batch.

Nothing materializes the embedding matrix; per-iteration cost is one
linear pass, so k-means at 100 TB is n_iter passes with backpressure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowutil import list_column_matrix


def _canonical_signs(components: np.ndarray) -> np.ndarray:
    """Fix each eigenvector's sign so its largest-|.| coordinate is
    positive — eigh's sign choice is arbitrary, and a deterministic
    convention keeps projections reproducible across runs/BLAS builds."""
    idx = np.argmax(np.abs(components), axis=1)
    signs = np.sign(components[np.arange(len(components)), idx])
    signs[signs == 0] = 1.0
    return components * signs[:, None]


def pca_fit(ds, *, emb_col: str = "embedding", n_components: int = 2):
    """Streaming-covariance PCA fit: per-batch (n, sum, X'X) partials,
    driver-side eigh of the (d, d) covariance. Returns (mean,
    components (n_components, d), explained_variance)."""

    def partials(batch: pa.Table) -> pa.Table:
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        d = X.shape[1]
        return pa.table(
            {
                "n": pa.array([float(len(X))]),
                "s": pa.array([X.sum(axis=0)]),
                "xtx": pa.array([(X.T @ X).reshape(-1)]),
                "d": pa.array([d], type=pa.int64()),
            }
        )

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    d = int(parts["d"].iloc[0])
    n = float(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    components = _canonical_signs(evecs[:, order].T)
    return mean, components, evals[order]


def pca_transform(ds, mean: np.ndarray, components: np.ndarray, *, emb_col: str = "embedding", id_col: str = "vec_id", round_to: int | None = 6):
    """Project every row onto the fitted components (broadcast model,
    one matmul per batch). Output: (id, pc0..pc{k-1})."""
    import ray

    model_ref = ray.put((np.asarray(mean), np.asarray(components)))

    def project(batch: pa.Table) -> pa.Table:
        m, comp = ray.get(model_ref)
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        Z = (X - m) @ comp.T
        if round_to is not None:
            Z = np.round(Z, round_to)
        cols = {id_col: batch[id_col]}
        for j in range(Z.shape[1]):
            cols[f"pc{j}"] = pa.array(Z[:, j])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def kmeans_fit(
    ds,
    n_clusters: int,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 10,
    seed: int = 42,
    init_sample: int = 2048,
) -> np.ndarray:
    """Distributed Lloyd's algorithm (Euclidean): centroids broadcast
    per iteration; every batch assigns its rows and emits per-cluster
    (sum, count) partials — k rows per batch, never the vectors. Init
    is seeded k-means++ on a deterministic driver-side sample (first
    `init_sample` rows by id: reproducible regardless of block order).
    Returns the (k, d) centroid matrix."""
    import ray

    # deterministic init sample = the `init_sample` smallest ids, taken
    # WITHOUT a global sort: each block reduces to its local min-k rows
    # (a combiner), and the tiny driver merge picks the global min-k.
    # ds.sort(id).limit(k) would all-to-all-shuffle the whole corpus
    # just to drop everything past row 2048.
    def local_min_k(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > init_sample:
            keep = np.argpartition(ids, init_sample - 1)[:init_sample]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch.select([id_col, emb_col])

    sample_df = (
        ds.map_batches(local_min_k, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col, kind="stable")
        .head(init_sample)
    )
    S = np.stack(sample_df[emb_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    centers = _kmeanspp_init(S, n_clusters, rng)

    for _ in range(n_iter):
        c_ref = ray.put(centers)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            X = list_column_matrix(batch[emb_col]).astype(np.float64)
            d2 = ((X**2).sum(axis=1)[:, None] - 2.0 * X @ c.T + (c**2).sum(axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            k = len(c)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            sums = np.zeros_like(c)
            np.add.at(sums, a, X)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "s": pa.array(list(sums)),
                    "n": pa.array(cnt),
                }
            )

        parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
        agg_n = parts.groupby("cluster")["n"].sum()
        sums = parts.groupby("cluster")["s"].apply(lambda col: np.sum(np.stack(col.to_numpy()), axis=0))
        new = centers.copy()
        for ci in agg_n.index:
            if agg_n.loc[ci] > 0:
                new[ci] = sums.loc[ci] / agg_n.loc[ci]
        if np.allclose(new, centers, atol=1e-9):
            centers = new
            break
        centers = new
    return centers


def _kmeanspp_init(S: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    centers = [S[int(rng.integers(len(S)))]]
    for _ in range(1, min(k, len(S))):
        d2 = np.min(
            ((S[:, None, :] - np.stack(centers)[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        p = d2 / max(d2.sum(), 1e-12)
        centers.append(S[int(rng.choice(len(S), p=p))])
    return np.stack(centers).astype(np.float64)


def kmeans_assign(ds, centers: np.ndarray, *, emb_col: str = "embedding", id_col: str = "vec_id"):
    """Label every row with its nearest centroid (broadcast centers)."""
    import ray

    c_ref = ray.put(np.asarray(centers, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        d2 = ((X**2).sum(axis=1)[:, None] - 2.0 * X @ c.T + (c**2).sum(axis=1)[None, :])
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def semdedup(
    ds,
    *,
    n_clusters: int,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 10,
    seed: int = 42,
    max_cluster: int = 8192,
):
    """Semantic near-dedup, SemDeDup-shaped (Abbas et al. 2023, public):
    k-means the embedding space, then within each cluster greedily keep
    the first item (id order) and mark any later item whose cosine
    similarity to an already-kept item reaches `threshold` as a dup of
    that keeper.

    Scale shape: the k-means fit is the streaming-partials pass above;
    the dedup pass shuffles only (id, cluster, embedding) grouped by
    cluster, and each cluster's O(k^2) similarity work is bounded by
    sub-splitting clusters larger than `max_cluster` by id hash (the
    standard within-cluster shard approximation: cross-shard dups in a
    mega-cluster are missed, never false-flagged). Returns a Dataset of
    (id, cluster, is_dup, rep_id) — the same cluster-map contract as
    stages/dedup.py.
    """
    import pandas as pd

    centers = kmeans_fit(
        ds, n_clusters, emb_col=emb_col, id_col=id_col, n_iter=n_iter, seed=seed
    )
    import ray

    c_ref = ray.put(np.asarray(centers, dtype=np.float64))

    def assign_keep(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        d2 = (X**2).sum(axis=1)[:, None] - 2.0 * X @ c.T + (c**2).sum(axis=1)[None, :]
        a = np.argmin(d2, axis=1).astype(np.int64)
        sub = (
            pd.util.hash_array(batch[id_col].to_numpy(zero_copy_only=False).astype(object))
            % np.uint64(2**31)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                emb_col: batch[emb_col],
                "cluster": pa.array(a),
                "__sub": pa.array(sub),
            }
        )

    assigned = ds.map_batches(assign_keep, batch_format="pyarrow")

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        X = list_column_matrix(group[emb_col]).astype(np.float64)[order]
        ids = ids[order]
        cluster = group["cluster"].to_numpy(zero_copy_only=False)[order]
        n = len(ids)
        norms = np.linalg.norm(X, axis=1)
        Xn = X / np.maximum(norms, 1e-12)[:, None]
        is_dup = np.zeros(n, dtype=bool)
        rep = ids.copy()
        kept: list[int] = []
        for i in range(n):
            if kept:
                sims = Xn[np.array(kept)] @ Xn[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    is_dup[i] = True
                    rep[i] = ids[kept[j]]
                    continue
            kept.append(i)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(cluster),
                "is_dup": pa.array(is_dup),
                "rep_id": pa.array(rep),
            }
        )

    # shard count is a row-local pure function of (cluster, id-hash):
    # no second pass needed; shards=1 (exact) unless the mean cluster
    # would exceed max_cluster
    n_rows = None
    try:
        n_rows = ds._meta_count()
    except Exception:
        pass
    shards = 1
    if n_rows:
        shards = max(1, int(np.ceil((n_rows / max(n_clusters, 1)) / max_cluster)))

    def key_col(batch: pa.Table) -> pa.Table:
        gk = batch["cluster"].to_numpy(zero_copy_only=False) * shards + (
            batch["__sub"].to_numpy(zero_copy_only=False) % shards
        )
        return batch.append_column("__g", pa.array(gk.astype(np.int64)))

    return (
        assigned.map_batches(key_col, batch_format="pyarrow")
        .groupby("__g")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def grouped_centroid(ds, *, label_col: str = "label", emb_col: str = "embedding", round_to: int = 6):
    """Per-group embedding centroid (the domain/class prototype table):
    one streaming pass where each batch emits a (label, sum-vector,
    count) partial — np.add.at over the zero-copy batch matrix, so only
    O(batches × groups × d) partial bytes leave the stream — followed
    by a group-count-sized combine. Returns the long-format
    (label, dim, mean_v) table, dim 1-based, mean rounded so the value
    is summation-order-stable for comparison."""

    def partials(batch: pa.Table) -> pa.Table:
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), X.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, X)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                label_col: pa.array(uniq),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1)), X.shape[1]
                ),
                "n": pa.array(n),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        S = np.stack([np.asarray(v, dtype=np.float64) for v in g["s"]])
        mean = S.sum(axis=0) / g["n"].sum()
        d = len(mean)
        return pd.DataFrame(
            {
                label_col: np.repeat(g[label_col].iloc[0], d),
                "dim": np.arange(1, d + 1, dtype=np.int64),
                "mean_v": np.round(mean, round_to),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(label_col)
        .map_groups(combine, batch_format="pandas")
    )


def centroid_outliers(
    ds,
    *,
    label_col: str = "label",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 20,
):
    """Per-class embedding outliers: the k vectors farthest (L2) from
    their OWN label's centroid — the mislabeled/noise-sample flag in
    embedding-space data audits. Pass 1 is the mergeable centroid fit
    (grouped_centroid partials); pass 2 broadcasts the small centroid
    matrix and scores each batch with one vectorized gather + norm,
    keeping a local top-k per batch so only k rows per block reach the
    global sort. Returns (id, label, dist) top-k by distance, ties on
    id, dist rounded to 6."""
    import ray

    cent = grouped_centroid(ds, label_col=label_col, emb_col=emb_col, round_to=12)
    cp = cent.to_pandas()  # groups × dim rows — a small model table
    labels = np.sort(cp[label_col].unique())
    d = int(cp["dim"].max())
    C = np.zeros((len(labels), d), dtype=np.float64)
    lab_pos = {lab: i for i, lab in enumerate(labels)}
    for lab, g in cp.groupby(label_col):
        C[lab_pos[lab]] = g.sort_values("dim")["mean_v"].to_numpy()
    model = ray.put((labels, C))

    def local_topk(batch: pa.Table) -> pa.Table:
        labs, cent_m = ray.get(model)
        n = batch.num_rows
        if n == 0:
            # keep the REAL column types so empty blocks unify with the rest
            return pa.table(
                {
                    id_col: batch[id_col],
                    label_col: batch[label_col],
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        X = list_column_matrix(batch[emb_col]).astype(np.float64)
        y = batch[label_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(labs, y)
        dist = np.round(np.linalg.norm(X - cent_m[pos], axis=1), 6)
        kk = min(k, n)
        # select on the ROUNDED distance with id tie-break — the same
        # deterministic order the global sort (and the SQL comparison)
        # uses, so block layout can't change which rows survive
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_np, -dist))[:kk]
        sel = np.sort(order)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(sel)),
                label_col: batch[label_col].take(pa.array(sel)),
                "dist": pa.array(dist[sel]),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["dist", id_col], descending=[True, False])
        .limit(k)
    )


def quantize_error(ds, *, emb_col: str = "embedding", id_col: str = "vec_id"):
    """Scalar int8-style quantization audit: per-dimension [min, max]
    from ONE mergeable cell pass, then a row-local quantize→dequantize
    and the per-vector reconstruction MSE — the standard check before
    shipping quantized embedding shards. All arithmetic is plain
    double-precision with floor(x+0.5) rounding, so an external engine
    replays the exact error values (the per-vector SUM is the only
    order-sensitive step; callers quantize the MSE before hashing).
    Constant dimensions (max == min) quantize to code 0 and dequantize
    to the constant — zero error."""
    from ray.data.aggregate import Max, Min

    from .arrowutil import list_column_matrix

    def cells(batch: pa.Table) -> pa.Table:
        m = list_column_matrix(batch[emb_col], dtype=np.float64)
        if not m.size:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64())})
        return pa.table({
            "d": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "lo": pa.array(m.min(axis=0)),
            "hi": pa.array(m.max(axis=0)),
        })

    mm = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas().sort_values("d")
    )
    lo = mm["lo"].to_numpy(np.float64)
    hi = mm["hi"].to_numpy(np.float64)
    import ray
    lo_ref, hi_ref = ray.put(lo), ray.put(hi)

    def err(batch: pa.Table) -> pa.Table:
        l, h = ray.get(lo_ref), ray.get(hi_ref)
        m = list_column_matrix(batch[emb_col], dtype=np.float64)
        if not m.size:  # empty block: (0,0) would not broadcast vs (D,)
            return pa.table({id_col: batch[id_col],
                             "mse": pa.array([], type=pa.float64())})
        span = h - l
        const = span == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            q = np.floor((m - l) / span * 255 + 0.5)
        q = np.clip(np.where(const, 0.0, q), 0, 255)
        deq = np.where(const, l, l + q / 255.0 * span)
        e = m - deq
        return pa.table({
            id_col: batch[id_col],
            "mse": pa.array((e * e).sum(axis=1) / m.shape[1]),
        })

    return ds.map_batches(err, batch_format="pyarrow")
