"""Training-data curation ops: dedup family, ANN search, text analysis,
multimodal plumbing — over the driver-provided testdata tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from complexity_driven_feature_construction_ray.stages import (
    embedding_dedup,
    exact_dedup,
    knn_bruteforce,
    knn_ivf,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard,
    simhash_dedup,
    text_analysis_dataset,
)
from complexity_driven_feature_construction_ray.stages.multimodal import (
    decode_pipeline,
    synthetic_media_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


class TestExactDedup:
    def test_with_injected_duplicates(self, ray_session, docs_pdf):
        dup = docs_pdf.head(20).copy()
        dup["doc_id"] = dup["doc_id"] + 100000
        both = pd.concat([docs_pdf, dup], ignore_index=True)
        out = exact_dedup(ray.data.from_pandas(both)).to_pandas()
        # all injected dups removed, originals kept (min doc_id wins)
        assert len(out) == len(docs_pdf)
        assert out["doc_id"].max() < 100000


class TestMinHash:
    def test_signature_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
        c = "completely different words appear in this unrelated sentence about trains"
        sa, sb, sc = minhash_signatures([a, b, c], num_perm=128)
        est_ab = (sa == sb).mean()
        est_ac = (sa == sc).mean()
        true_ab = ngram_jaccard(a, b)
        assert abs(est_ab - true_ab) < 0.2
        assert est_ac < 0.1 < est_ab

    def test_lsh_finds_injected_neardups(self, ray_session, docs_pdf):
        near = docs_pdf.head(10).copy()
        near["doc_id"] = near["doc_id"] + 100000
        near["text"] = near["text"] + " extra"
        both = pd.concat([docs_pdf, near], ignore_index=True)
        clusters = minhash_lsh_dedup(
            ray.data.from_pandas(both), threshold=0.6
        )
        dups = set(clusters[clusters["is_dup"]]["id"])
        # every injected near-dup is flagged, with the original as rep
        for i in near["doc_id"]:
            assert i in dups
        reps = clusters.set_index("id")["rep_id"]
        for i in near["doc_id"]:
            assert reps[i] == i - 100000


class TestSimHash:
    def test_exact_dup_same_hash_and_cluster(self, ray_session, docs_pdf):
        dup = docs_pdf.head(5).copy()
        dup["doc_id"] = dup["doc_id"] + 100000
        both = pd.concat([docs_pdf, dup], ignore_index=True)
        clusters = simhash_dedup(ray.data.from_pandas(both), max_hamming=3)
        reps = clusters.set_index("id")["rep_id"]
        for i in dup["doc_id"]:
            assert reps[i] == i - 100000


class TestEmbeddingOps:
    @pytest.fixture(scope="class")
    def embs(self, ray_session):
        return ray.data.read_parquet(f"{SF}/embeddings.parquet")

    @pytest.fixture(scope="class")
    def embs_np(self):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet")
        return (
            t["vec_id"].to_numpy(),
            np.stack(t["embedding"].to_pylist()).astype(np.float64),
        )

    def test_knn_bruteforce_matches_numpy(self, embs, embs_np):
        ids, m = embs_np
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        q = m[:3]
        out = knn_bruteforce(embs, q, k=5)
        assert set(out["query_id"]) == {0, 1, 2}
        for qi in range(3):
            sims = mn @ (mn[qi])
            order = np.lexsort((ids, -sims))[:5]
            got = out[out["query_id"] == qi].sort_values("rank")
            assert list(got["id"]) == list(ids[order])
            assert np.allclose(got["score"].values, sims[order])

    def test_knn_ivf_recall(self, embs, embs_np):
        ids, m = embs_np
        q = m[:5]
        exact = knn_bruteforce(embs, q, k=10)
        approx = knn_ivf(embs, q, k=10, n_clusters=8, nprobe=4)
        recall = []
        for qi in range(5):
            e = set(exact[exact["query_id"] == qi]["id"])
            a = set(approx[approx["query_id"] == qi]["id"])
            recall.append(len(e & a) / len(e))
        assert np.mean(recall) > 0.6  # nprobe=4 of 8 cells



    def test_knn_pq_self_retrieval_and_contract(self, embs, embs_np):
        from complexity_driven_feature_construction_ray.stages.similarity import knn_pq

        ids, m = embs_np
        q = m[:4]
        out = knn_pq(embs, q, k=5, m=8, codes=16)
        assert list(out.columns) == ["query_id", "id", "score", "rank"]
        for qi in range(4):
            g = out[out["query_id"] == qi].sort_values("rank")
            assert len(g) == 5
            # ADC distance of the query to ITS OWN codes is the pure
            # quantization error -- far below any other random vector's,
            # so self-retrieval at rank 1 must hold
            assert g.iloc[0]["id"] == ids[qi]
            assert g["score"].is_monotonic_decreasing or len(set(g["score"])) < 5

    def test_embedding_dedup_finds_clones(self, ray_session, embs_np):
        ids, m = embs_np
        clones = pd.DataFrame(
            {"vec_id": ids[:5] + 100000, "embedding": list(m[:5] * 1.001), "label": 0}
        )
        base = pd.DataFrame({"vec_id": ids, "embedding": list(m), "label": 0})
        both = pd.concat([base, clones], ignore_index=True)
        clusters = embedding_dedup(ray.data.from_pandas(both), threshold=0.999)
        reps = clusters.set_index("id")["rep_id"]
        for i in clones["vec_id"]:
            assert reps[i] == i - 100000


class TestTextAnalysis:
    def test_counts_quality_and_langid(self, ray_session, docs, docs_pdf):
        out = text_analysis_dataset(docs, lang_concurrency=2).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        ref = docs_pdf.sort_values("doc_id").reset_index(drop=True)
        # whitespace token count matches str.split oracle
        exp = ref["text"].str.split().map(len)
        assert (out["n_tokens_ws"] == exp).all()
        # deterministic fingerprint: equal texts -> equal fp, and stable
        assert out["fingerprint"].dtype == np.int64
        again = text_analysis_dataset(docs, lang_concurrency=2).to_pandas()
        assert (
            again.sort_values("doc_id")["fingerprint"].values == out["fingerprint"].values
        ).all()
        # lang-id emits only known labels (the testdata's lang column is a
        # label over English-ish synthetic text, so accuracy vs it is
        # meaningless — the heuristic itself is tested on real snippets)
        assert set(out["lang_pred"]) <= {"en", "de", "fr", "es", "zh"}

    def test_langid_heuristic_on_real_snippets(self, ray_session):
        import pyarrow as pa

        from complexity_driven_feature_construction_ray.stages import LanguageId

        snippets = {
            "en": "the cat sat on the mat and it was happy with the result of it",
            "de": "der hund ist nicht mit der katze und das ist ein problem für die stadt",
            "fr": "le chat est dans la maison et il est une bonne idée pour les enfants",
            "es": "el perro es una mascota para la familia y los niños en la casa",
            "zh": "数据库 系统 的 查询 优化 是 一个 重要 的 研究 方向",
        }
        out = LanguageId()(pa.table({"text": list(snippets.values())}))
        assert out["lang_pred"].to_pylist() == list(snippets.keys())


class TestMultimodal:
    def test_decode_pipeline_plumbing(self, ray_session):
        t = synthetic_media_table(64)
        out = decode_pipeline(ray.data.from_arrow(t), fake=True).to_pandas()
        assert len(out) == 64
        assert len(out["features"][0]) == 16
        assert abs(sum(out["features"][0]) - 1.0) < 1e-5  # normalized histogram
        assert len(out["frames"][0]) == 4

    def test_real_decode_raises_cleanly(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.multimodal import ImageDecode

        dec = ImageDecode(fake=False)
        with pytest.raises(NotImplementedError):
            dec(synthetic_media_table(2))


def test_image_resize_stub(ray_session):
    import json

    import ray.data

    from complexity_driven_feature_construction_ray.stages.multimodal import (
        ImageResize,
        synthetic_media_table,
    )

    ds = ray.data.from_arrow(synthetic_media_table(32, payload_bytes=1024))
    out = ds.map_batches(
        ImageResize, fn_constructor_kwargs={"scale": 0.5, "fake": True},
        batch_format="pyarrow", batch_size=16, concurrency=2,
    ).to_pandas()
    assert len(out) == 32
    # image rows are strided 4x; audio rows pass through UNTOUCHED (a
    # mixed media table must not have its audio bytes decimated)
    for mt, p in zip(out["media_type"], out["payload"]):
        assert len(p) == (256 if mt.startswith("image") else 1024), mt
    metas = [json.loads(m) for m in out["meta"]]
    assert all(m["w"] == 32 for m in metas if "w" in m)


class TestDecontaminate:
    def test_flags_ngram_overlap(self, ray_session):
        from complexity_driven_feature_construction_ray.stages.dedup import decontaminate

        bench = ["alpha beta gamma delta epsilon zeta eta theta iota kappa"]
        train = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    # contains the benchmark 8-gram "alpha..theta" verbatim
                    "prefix words alpha beta gamma delta epsilon zeta eta theta suffix",
                    # shares words but no 8-gram run
                    "alpha beta gamma OTHER delta epsilon zeta eta theta",
                    "completely unrelated text about data engines and arrow batches",
                    "",
                ],
            }
        )
        ds = ray.data.from_pandas(train)
        out = (
            decontaminate(ds, bench, ngram_words=8, mode="flag")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["contaminated"].tolist() == [True, False, False, False]
        kept = decontaminate(ds, bench, ngram_words=8, mode="drop").to_pandas()
        assert sorted(kept["doc_id"]) == [1, 2, 3]

    def test_single_entity_skew_still_runs(self, ray_session):
        """A pathological 1-entity dataset lands in one hash bucket by
        construction (per-entity semantics); the data-sized bucket count
        must not break it and the scan must stay correct."""
        from complexity_driven_feature_construction_ray.stages.temporal import rolling_agg

        n = 50_000
        df = pd.DataFrame(
            {
                "k": ["only"] * n,
                "ts": pd.Timestamp("2025-01-01") + pd.to_timedelta(np.arange(n), unit="s"),
                "v": np.ones(n),
            }
        )
        out = rolling_agg(
            ray.data.from_pandas(df).repartition(8),
            key="k", ts="ts", col="v", window=10, agg="sum", out_col="r",
        ).to_pandas()
        assert len(out) == n
        assert out["r"].iloc[-1] == 10.0


class TestRepetitionAndPII:
    def test_repetition_stats_known_values(self):
        from complexity_driven_feature_construction_ray.stages.text import repetition_stats

        t = pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "a a a a",          # 1 distinct / 4 -> dup .75, top 1.0
                    "a b c d",          # all distinct -> dup 0, top .25
                    "a a b b",          # dup .5, top .5
                    "",                 # empty -> 0 / 0
                ],
            }
        )
        out = repetition_stats(t)
        assert out["dup_word_frac"].to_pylist() == [0.75, 0.0, 0.5, 0.0]
        assert out["top_word_frac"].to_pylist() == [1.0, 0.25, 0.5, 0.0]

    def test_pii_counts_and_mask(self):
        from complexity_driven_feature_construction_ray.stages.text import pii_scan

        t = pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "mail me at a.b+c@site.org or boss@x.co thanks",
                    "call 555-123-4567 or +49 123-456-7890",
                    "no pii here",
                ],
            }
        )
        out = pii_scan(t)
        assert out["n_emails"].to_pylist() == [2, 0, 0]
        assert out["n_phones"].to_pylist() == [0, 2, 0]
        masked = pii_scan(t, mode="mask")
        texts = masked["text"].to_pylist()
        assert texts[0] == "mail me at [EMAIL] or [EMAIL] thanks"
        assert "[PHONE]" in texts[1] and "555" not in texts[1]
        assert texts[2] == "no pii here"


class TestFixedListIngestion:
    def test_cast_fixed_list_and_no_partial_execution(self, ray_session):
        """Variable list<float> columns must NOT silently take(1): the
        dedup raises with a pointer, and cast_fixed_list at ingestion
        makes the width schema metadata so the same call then works."""
        import pyarrow as pa
        import pytest as _pytest

        from complexity_driven_feature_construction_ray.stages.arrowutil import (
            cast_fixed_list,
        )

        rng = np.random.default_rng(3)
        m = rng.normal(size=(40, 8))
        tbl = pa.table({
            "vec_id": pa.array(np.arange(40, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in m],
                                  type=pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl)
        with _pytest.raises(ValueError, match="cast_fixed_list"):
            embedding_dedup(ds, threshold=0.999)

        both = pa.table({
            "vec_id": pa.array(
                np.concatenate([np.arange(40), [100000]]).astype(np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in m] + [(m[0] * 1.001).tolist()],
                type=pa.list_(pa.float32())),
        })
        # cast at ingestion + materialize: the fixed width becomes
        # schema METADATA, so dedup infers dim with no data peek
        fixed = cast_fixed_list(
            ray.data.from_arrow(both), "embedding", 8).materialize()
        out = embedding_dedup(fixed, threshold=0.999)
        reps = out.set_index("id")["rep_id"]
        assert reps[100000] == 0

        # ragged rows fail loudly inside the cast, not with a wrong
        # reshape downstream
        ragged = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([0, 1], type=pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                                  type=pa.list_(pa.float32())),
        }))
        with _pytest.raises(Exception, match="width|ragged"):
            cast_fixed_list(ragged, "embedding", 2).materialize()
