"""Char-class profile / hash collision audit vs brute-force references
at sf0.001."""

import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_charclass_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_charclass,
    )

    out = d_charclass(SF).set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    for src, g in docs.groupby("source"):
        txt = "".join(t or "" for t in g["text"])
        chars = len(txt)
        assert int(out.loc[src, "chars"]) == chars
        for name, rx in (("upper", r"[A-Z]"), ("digit", r"[0-9]"),
                         ("space", r"\s"), ("nonascii", r"[^\x00-\x7f]")):
            frac = len(re.findall(rx, txt)) / chars
            assert abs(out.loc[src, f"{name}_frac"] - frac) < 5e-6
        # fractions are proper
        assert 0.0 <= out.loc[src, "nonascii_frac"] <= 1.0


def test_hash_collisions_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_hash_collisions,
    )
    from complexity_driven_feature_construction_ray.stages.text import horner_mod61

    out = d_hash_collisions(SF).iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    vocab = set()
    for t in docs["text"]:
        vocab.update((t or "").split())
    hv = np.unique(horner_mod61(sorted(vocab)).astype(np.int64))
    loads = np.bincount(hv % 64, minlength=64)
    assert int(out["vocab"]) == len(hv)
    assert int(out["used_buckets"]) == int((loads > 0).sum())
    assert int(out["max_load"]) == int(loads.max())
    colliding = int(loads[loads >= 2].sum())
    assert abs(out["collision_frac"] - colliding / len(hv)) < 5e-6
    # consistency: used <= min(dim, vocab); colliding <= vocab
    assert out["used_buckets"] <= min(64, out["vocab"])
    assert 0.0 <= out["collision_frac"] <= 1.0
