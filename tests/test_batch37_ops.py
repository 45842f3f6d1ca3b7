"""C4 funnel / key-uniqueness audit vs brute-force references at
sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_c4_funnel_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_c4_funnel,
    )

    out = d_c4_funnel(SF).set_index("stage")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    s = docs["text"].fillna("")
    nw = s.str.count(r"\S+").to_numpy()
    nonws = s.str.replace(r"\s+", "", regex=True).str.len().to_numpy()
    m1 = (nw >= 30) & (nw <= 10000)
    m2 = m1 & (nonws / np.maximum(nw, 1) <= 4.6)
    m3 = m2 & ~s.str.contains("{", regex=False).to_numpy()
    m4 = m3 & ~s.str.lower().str.contains("lorem ipsum",
                                          regex=False).to_numpy()
    total = len(s)
    for stage, m in (("word_count", m1), ("mean_wl", m2),
                     ("brace", m3), ("lorem", m4)):
        assert int(out.loc[stage, "n_pass"]) == int(m.sum())
        assert abs(out.loc[stage, "pass_frac"] - m.sum() / total) < 5e-6
    # funnel is monotone non-increasing
    np_pass = out.sort_values("stage_idx")["n_pass"].to_numpy()
    assert (np.diff(np_pass) <= 0).all()
    # last stage equals the composed keep mask the standalone filter uses
    from complexity_driven_feature_construction_ray.stages.text import c4_keep_mask
    assert int(out.loc["lorem", "n_pass"]) == int(c4_keep_mask(s).sum())


def test_key_audit_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_key_audit,
    )

    out = q_key_audit(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    k = li["l_orderkey"].to_numpy(np.int64) * 16 \
        + li["l_linenumber"].to_numpy(np.int64)
    _, counts = np.unique(k, return_counts=True)
    assert int(out["n_rows"]) == len(k)
    assert int(out["n_keys"]) == len(counts)
    assert int(out["dup_keys"]) == int((counts > 1).sum())
    assert int(out["dup_rows"]) == int(counts[counts > 1].sum())
    assert int(out["max_multiplicity"]) == int(counts.max())
    assert abs(out["dup_frac"]
               - counts[counts > 1].sum() / len(k)) < 5e-6
    # fixture really has duplicate keys (this audit isn't vacuous)
    assert out["dup_keys"] > 0
