"""char_fingerprint vs an independent big-int Horner reference."""

import pyarrow as pa

P = (1 << 61) - 1
B = 1_000_003


def _ref(text: str) -> int:
    acc = 0
    for ch in text:
        acc = (acc * B + ord(ch)) % P
    return acc


def test_char_fingerprint_matches_bigint_reference(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import char_fingerprint

    texts = ["hello world", "world hello", "", "a", "x" * 900,
             "the quick brown fox " * 40]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = char_fingerprint(batch).to_pandas()
    for i, t in enumerate(texts):
        assert int(out.loc[i, "char_fp"]) == _ref(t), repr(t[:30])
    # order sensitivity
    assert out.loc[0, "char_fp"] != out.loc[1, "char_fp"]
    assert out.loc[2, "char_fp"] == 0


def test_hash_features_counts(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import (
        hash_features, horner_mod61,
    )

    batch = pa.table({
        "doc_id": [1, 2],
        "text": ["cat dog cat", ""],
    })
    out = hash_features(batch).to_pandas()
    cat_b = int(horner_mod61(["cat"])[0] % 64)
    dog_b = int(horner_mod61(["dog"])[0] % 64)
    got = out.set_index("bucket")["n"].to_dict()
    if cat_b == dog_b:
        assert got == {cat_b: 3}
    else:
        assert got == {cat_b: 2, dog_b: 1}
    assert (out["doc_id"] == 1).all()  # empty doc emits nothing
