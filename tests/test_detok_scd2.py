"""Vocab decode round-trip + SCD-2 interval build vs brute-force oracles."""

import numpy as np
import pandas as pd
import ray.data


def test_vocab_roundtrip_full_vocab(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import (
        build_vocab, vocab_decode, vocab_encode,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c a", "  spaced   out\ttabs ", "", "unique words only here"],
    })
    ds = ray.data.from_pandas(pdf)
    toks, ids = build_vocab(ds, text_col="text")
    enc = vocab_encode(ds, toks, ids, with_ids=True).select_columns(["doc_id", "ids"])
    out = vocab_decode(enc, toks, ids).to_pandas().sort_values("doc_id")
    norm = pdf["text"].str.findall(r"\S+").map(" ".join)
    assert out["text"].tolist() == norm.tolist()


def test_vocab_decode_oov_unk(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import vocab_decode

    toks = np.array(["bar", "foo"])  # sorted; ids: foo=0, bar=1
    ids = np.array([1, 0], dtype=np.int32)
    enc = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "ids": [[0, -1, 1], []],
    }))
    out = vocab_decode(enc, toks, ids).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["foo <unk> bar", ""]


def test_scd2_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_scd2

    out = q_scd2("/root/testdata/sf0.001")
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        ver, prev = 0, None
        spans = []
        for _, r in g.iterrows():
            if r["event_type"] != prev:
                ver += 1
                spans.append([uid, ver, r["event_type"], r["ts"].value // 1000, -1])
                prev = r["event_type"]
        for i in range(len(spans) - 1):
            spans[i][4] = spans[i + 1][3]
        rows += spans
    exp = pd.DataFrame(rows, columns=["user_id", "version", "event_type",
                                      "valid_from_us", "valid_to_us"])
    exp = exp.sort_values(["user_id", "version"]).reset_index(drop=True)
    assert len(out) == len(exp) > 0
    for c in exp.columns:
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (out["is_current"] == (out["valid_to_us"] == -1)).all()
    # every user has exactly one open (current) version
    cur = out[out["is_current"]].groupby("user_id").size()
    assert (cur == 1).all()
