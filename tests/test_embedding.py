"""Distributed PCA / k-means / TF-IDF vs exact in-memory oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from complexity_driven_feature_construction_ray.stages.embedding import (
    _canonical_signs,
    kmeans_assign,
    kmeans_fit,
    pca_fit,
    pca_transform,
)
from complexity_driven_feature_construction_ray.stages.text import tfidf_sum


def _emb_ds(X: np.ndarray, override_num_blocks: int = 4):
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.astype(np.float32).reshape(-1)), X.shape[1]
            ),
        }
    )
    return ray.data.from_arrow(tbl).repartition(override_num_blocks)


class TestDistributedPCA:
    def test_matches_inmemory_pca(self, ray_session):
        rng = np.random.default_rng(11)
        # anisotropic cloud: PC0 along a known direction
        base = rng.normal(size=(400, 6))
        base[:, 0] *= 8.0
        base[:, 1] *= 3.0
        X = base @ np.linalg.qr(rng.normal(size=(6, 6)))[0]
        ds = _emb_ds(X)
        mean, comps, evals = pca_fit(ds, n_components=3)

        Xc = X - X.mean(axis=0)
        cov = (Xc.T @ Xc) / len(X)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:3]
        exp_comps = _canonical_signs(v[:, order].T)

        np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-4)
        np.testing.assert_allclose(np.abs(comps), np.abs(exp_comps), atol=1e-4)
        np.testing.assert_allclose(evals, w[order], rtol=1e-3)

        proj = (
            pca_transform(ds, mean, comps, round_to=None)
            .to_pandas()
            .sort_values("vec_id")
        )
        Z = (X - mean) @ comps.T
        np.testing.assert_allclose(proj[["pc0", "pc1", "pc2"]].to_numpy(), Z, atol=1e-3)

    def test_partials_are_block_count_invariant(self, ray_session):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(200, 4))
        m1, c1, _ = pca_fit(_emb_ds(X, 2), n_components=2)
        m2, c2, _ = pca_fit(_emb_ds(X, 7), n_components=2)
        np.testing.assert_allclose(m1, m2, atol=1e-10)
        np.testing.assert_allclose(c1, c2, atol=1e-8)


def _lloyd(X, centers, n_iter):
    c = centers.copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        new = c.copy()
        for ci in range(len(c)):
            m = a == ci
            if m.any():
                new[ci] = X[m].mean(axis=0)
        if np.allclose(new, c, atol=1e-9):
            return new
        c = new
    return c


class TestDistributedKMeans:
    def test_matches_driver_side_lloyd(self, ray_session):
        rng = np.random.default_rng(0)
        blobs = np.concatenate(
            [rng.normal(loc=mu, scale=0.3, size=(80, 4)) for mu in (0.0, 5.0, -5.0)]
        ).astype(np.float32)
        X = blobs.astype(np.float64)
        ds = _emb_ds(blobs)
        centers = kmeans_fit(ds, n_clusters=3, n_iter=8, seed=7, init_sample=240)

        # same init path driver-side: sample = first 240 rows by id
        from complexity_driven_feature_construction_ray.stages.embedding import _kmeanspp_init

        init = _kmeanspp_init(X[:240], 3, np.random.default_rng(7))
        expected = _lloyd(X, init, 8)
        np.testing.assert_allclose(np.sort(centers, axis=0), np.sort(expected, axis=0), atol=1e-6)

        out = kmeans_assign(ds, centers).to_pandas().sort_values("vec_id")
        a = out["cluster"].to_numpy()
        # the three planted blobs land in three distinct pure clusters
        groups = [a[:80], a[80:160], a[160:]]
        labels = [np.unique(g) for g in groups]
        assert all(len(u) == 1 for u in labels)
        assert len({int(u[0]) for u in labels}) == 3


def _brute_tfidf(texts):
    from collections import Counter

    tf = [Counter(t.split()) for t in texts]
    df = Counter(w for c in tf for w in c)
    n = len(texts)
    return {
        i: round(sum(c[w] * np.log(n / df[w]) for w in c), 6)
        for i, c in enumerate(tf)
        if c
    }


class TestTfidf:
    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30))) for _ in range(60)]
        texts.append("")  # empty doc -> no row
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
        ).repartition(3)
        got = tfidf_sum(ds).to_pandas().set_index("doc_id")["tfidf_sum"].to_dict()
        exp = _brute_tfidf(texts)
        assert set(got) == set(exp)
        for k in exp:
            assert abs(got[k] - exp[k]) < 1e-5, k


class TestSemDeDup:
    """Planted near-duplicates must be flagged; every flag must have a
    kept same-cluster neighbor at/above the threshold (no false reps)."""

    def _corpus(self, seed=3, n_base=120, d=16, thr=0.95):
        rng = np.random.default_rng(seed)
        # unstructured gaussians: random pairwise cosine in d=16 is
        # ~N(0, 1/sqrt(d)) — far below threshold — while planted dups
        # sit at cosine ~1 (a mean-offset corpus would make every
        # same-mode pair near-parallel and flag everything)
        base = rng.standard_normal((n_base, d))
        # plant a near-dup of every 10th base vector: tiny perturbation
        dup_src = np.arange(0, n_base, 10)
        dups = base[dup_src] + 1e-3 * rng.standard_normal((len(dup_src), d))
        X = np.concatenate([base, dups])
        return X, dup_src, n_base

    def test_planted_dups_flagged(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.embedding import semdedup

        X, dup_src, n_base = self._corpus()
        out = (
            semdedup(_emb_ds(X, 6), n_clusters=4, threshold=0.95, n_iter=8, seed=0)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(X)
        # each planted (src, dup) pair loses exactly one member
        for k, src in enumerate(dup_src):
            pair = out[out.vec_id.isin([src, n_base + k])]
            assert pair.is_dup.sum() == 1, (src, n_base + k)
        # soundness: every dup's rep is a kept row in the same cluster
        # with cosine >= threshold
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        kept_ids = set(out[~out.is_dup].vec_id)
        for _, r in out[out.is_dup].iterrows():
            assert r.rep_id in kept_ids
            rep_row = out[out.vec_id == r.rep_id].iloc[0]
            assert rep_row.cluster == r.cluster
            assert Xn[int(r.vec_id)] @ Xn[int(r.rep_id)] >= 0.95 - 1e-9

    def test_deterministic_across_block_layouts(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.embedding import semdedup

        X, _, _ = self._corpus(seed=11)
        a = (
            semdedup(_emb_ds(X, 3), n_clusters=4, threshold=0.95, n_iter=8, seed=0)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        b = (
            semdedup(_emb_ds(X, 9), n_clusters=4, threshold=0.95, n_iter=8, seed=0)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        assert a.equals(b)


class TestGroupedCentroid:
    def test_matches_numpy_group_means(self, ray_session):
        import pyarrow as pa
        import ray

        from complexity_driven_feature_construction_ray.stages.embedding import grouped_centroid

        rng = np.random.default_rng(5)
        n, d = 400, 8
        X = rng.normal(size=(n, d)).astype(np.float32)
        labels = rng.integers(0, 5, size=n).astype(np.int32)
        tbl = pa.table(
            {
                "label": pa.array(labels),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.reshape(-1)), d
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        got = (
            grouped_centroid(ds)
            .to_pandas()
            .sort_values(["label", "dim"])
            .reset_index(drop=True)
        )
        for lab in np.unique(labels):
            exp = np.round(X[labels == lab].astype(np.float64).mean(axis=0), 6)
            g = got[got["label"] == lab].sort_values("dim")["mean_v"].to_numpy()
            np.testing.assert_allclose(g, exp, atol=1.5e-6)
        assert got["dim"].min() == 1 and got["dim"].max() == d


class TestCentroidOutliers:
    def test_planted_outlier_ranks_first(self, ray_session):
        import pyarrow as pa
        import ray

        from complexity_driven_feature_construction_ray.stages.embedding import (
            centroid_outliers,
        )

        rng = np.random.default_rng(6)
        n, d = 300, 8
        X = rng.normal(size=(n, d)).astype(np.float32)
        labels = (np.arange(n) % 3).astype(np.int32)
        X[42] = 50.0  # far from label-0's centroid
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "label": pa.array(labels),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(X.reshape(-1)), d
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        got = centroid_outliers(ds, k=5).to_pandas()
        assert got.iloc[0]["vec_id"] == 42
        # exact distance vs numpy replication of the same definition
        mu = np.round(X[labels == 0].astype(np.float64).mean(axis=0), 12)
        exp = round(float(np.linalg.norm(X[42].astype(np.float64) - mu)), 6)
        assert got.iloc[0]["dist"] == exp
        assert (np.diff(got["dist"].to_numpy()) <= 0).all()


class TestEmbedDispersion:
    def test_matches_numpy_intra_class_msd(self, ray_session):
        from complexity_driven_feature_construction_ray.pipelines.relational import (
            d_embed_dispersion,
        )

        got = d_embed_dispersion("/root/testdata/sf0.001").set_index("label")
        df = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        y = df["label"].to_numpy()
        for lab in np.unique(y):
            sub = X[y == lab]
            mu = np.round(sub.mean(axis=0), 12)
            msd = round(float(((sub - mu) ** 2).sum(axis=1).mean()), 6)
            assert got.loc[lab, "n"] == len(sub)
            assert abs(got.loc[lab, "msd"] - msd) < 2e-6
