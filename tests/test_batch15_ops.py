"""Label-noise detection / hard-negative mining vs brute-force
references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _load():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return (emb["vec_id"].to_numpy(np.int64),
            emb["label"].to_numpy(np.int64), Xn)


def test_label_noise_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_label_noise

    out = d_label_noise(SF).to_pandas().set_index("vec_id")
    ids, labels, Xn = _load()
    sim = Xn @ Xn.T
    micro = np.floor(sim * 1e6 + 0.5005).astype(np.int64)
    rng = np.random.default_rng(0)
    for i in rng.choice(len(ids), 25, replace=False):
        key = micro[i] * np.int64(1 << 33) - ids
        key[i] = np.iinfo(np.int64).min
        top5 = np.argsort(key)[-5:][::-1]
        nl = labels[top5]
        counts = np.bincount(nl, minlength=labels.max() + 1)
        maj = int(counts.argmax())
        agree = int(counts[maj])
        row = out.loc[ids[i]]
        assert int(row["majority_label"]) == maj
        assert int(row["n_agree"]) == agree
        assert bool(row["suspect"]) == (maj != labels[i] and agree >= 4)
    assert len(out) == len(ids)
    # sanity: most labels are NOT flagged
    assert out["suspect"].mean() < 0.5


def test_hard_negative_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_hard_negative

    out = d_hard_negative(SF).to_pandas().set_index("query_id")
    ids, labels, Xn = _load()
    sim = Xn @ Xn.T
    micro = np.floor(sim * 1e6 + 0.5005).astype(np.int64)
    for qi in np.flatnonzero(ids < 10):
        key = micro[qi] * np.int64(1 << 33) - ids
        own = labels[qi]
        neg = np.where(labels != own, key, np.iinfo(np.int64).min)
        pos = np.where((labels == own) & (ids != ids[qi]), key,
                       np.iinfo(np.int64).min)
        jn, jp = int(neg.argmax()), int(pos.argmax())
        row = out.loc[ids[qi]]
        assert int(row["hard_neg_id"]) == int(ids[jn])
        assert int(row["hard_pos_id"]) == int(ids[jp])
        assert int(row["hard_neg_micro"]) == int(micro[qi, jn])
        assert int(row["hard_pos_micro"]) == int(micro[qi, jp])
        # a hard negative is by definition a different label; positive same
        assert labels[jn] != own and labels[jp] == own
    assert len(out) == int((ids < 10).sum())
