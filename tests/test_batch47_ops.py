"""Token dispersion (Church-Gale burstiness) vs brute-force reference
at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_token_dispersion_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_token_dispersion,
    )

    out = d_token_dispersion(SF).set_index("tok")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    from collections import Counter
    corpus = Counter()
    per_doc = []
    for t in docs["text"]:
        cnt = Counter((t or "").split())
        per_doc.append(cnt)
        corpus.update(cnt)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    D = len(docs)
    assert set(out.index) == {t for t, _ in top}
    for tok, total in top:
        counts = np.array([c.get(tok, 0) for c in per_doc], np.float64)
        assert int(out.loc[tok, "count"]) == total
        assert int(out.loc[tok, "doc_freq"]) == int((counts > 0).sum())
        assert abs(out.loc[tok, "mean_per_doc"] - counts.mean()) < 5e-6
        vmr = counts.var(ddof=1) / counts.mean()
        assert abs(out.loc[tok, "vmr"] - vmr) < 5e-4
        assert out.loc[tok, "vmr"] >= -1e-9
