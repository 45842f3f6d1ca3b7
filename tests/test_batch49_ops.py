"""Pairwise JSD matrix vs brute-force reference at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_js_matrix_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_js_matrix,
    )

    out = d_js_matrix(SF).set_index(["src_a", "src_b"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    from collections import Counter
    per_src = {}
    for src, g in docs.groupby("source"):
        cnt = Counter()
        for t in g["text"]:
            cnt.update((t or "").split())
        per_src[src] = cnt
    srcs = sorted(per_src)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    checked = 0
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            ca, cb = per_src[sa], per_src[sb]
            na, nb = sum(ca.values()), sum(cb.values())
            jsd = 0.0
            for tok in set(ca) | set(cb):
                p, q = ca.get(tok, 0) / na, cb.get(tok, 0) / nb
                m = (p + q) / 2
                if p > 0:
                    jsd += 0.5 * p * np.log(p / m)
                if q > 0:
                    jsd += 0.5 * q * np.log(q / m)
            got = out.loc[(sa, sb), "jsd"]
            assert abs(got - jsd) < 5e-5
            assert -1e-9 <= got <= np.log(2) + 1e-9
            checked += 1
            if checked >= 40:  # full O(pairs·vocab) loop is slow in pure
                return         # Python; 40 pairs is ample evidence
