"""URL extraction / Bloom FPR / Mann-Kendall / attribution vs
brute-force references at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_url_extract_matches_bruteforce(ray_session):
    import re

    from complexity_driven_feature_construction_ray.pipelines.relational import d_url_extract

    out = d_url_extract(SF).to_pandas().set_index("domain")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    from collections import Counter, defaultdict
    urls = Counter()
    doc_sets = defaultdict(set)
    for _, r in docs.iterrows():
        t = r["text"] or ""
        did = int(r["doc_id"])
        if did % 3 == 0:
            t += f" http://dom{did % 7}.example.com/a"
        if did % 6 == 0:
            t += " https://mirror.example.org/p?q=1"
        if did % 9 == 0:
            t += f" http://dom{did % 7}.example.com/a"
        for d in re.findall(r"https?://([a-z0-9.-]+)", t):
            urls[d] += 1
            doc_sets[d].add(did)
    assert set(out.index) == set(urls)
    for d in urls:
        assert int(out.loc[d, "n_urls"]) == urls[d]
        assert int(out.loc[d, "n_docs"]) == len(doc_sets[d])
    # the %9 duplicate guarantees at least one domain with n_urls > n_docs
    assert (out["n_urls"] > out["n_docs"]).any()


def test_bloom_invariants(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_bloom_fpr

    out = d_bloom_fpr(SF).iloc[0]
    # zero false negatives: every member must hit
    assert int(out["n_member_hits"]) == int(out["n_members"])
    # the filter is not degenerate (some bits set, not all)
    assert 0 < int(out["n_set_bits"]) < int(out["m_bits"])
    assert int(out["n_set_bits"]) <= 3 * int(out["n_members"])
    # FPR is bounded by the textbook estimate with generous slack
    m, k = float(out["m_bits"]), 3
    n = float(out["n_members"])
    est = (1 - np.exp(-k * n / m)) ** k
    assert float(out["fp_rate"]) <= max(4 * est, 0.02)
    assert int(out["n_fp"]) == round(
        float(out["fp_rate"]) * int(out["n_nonmember_probes"])
    )


def test_mann_kendall_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_mann_kendall

    out = t_mann_kendall(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for uid, g in ev.groupby("user_id"):
        c = np.floor(g["value"].to_numpy(np.float64) * 100 + 0.5)
        n = len(c)
        if n < 2:
            assert uid not in out.index
            continue
        s = sum(np.sign(c[j] - c[i]) for i in range(n) for j in range(i + 1, n))
        assert int(out.loc[uid, "mk_s"]) == int(s)
        assert int(out.loc[uid, "n_pairs"]) == n * (n - 1) // 2
        assert abs(out.loc[uid, "mk_tau"] - s / (n * (n - 1) / 2)) < 2e-6
        checked += 1
    assert checked >= 5


def test_attribution_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import t_attribution

    out = t_attribution(SF).to_pandas().set_index("purchase_id")["click_id"]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    look = pd.Timedelta(days=7)
    n_attr = 0
    for uid, g in ev.groupby("user_id"):
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != "purchase":
                continue
            exp = np.nan
            for p in reversed(rows[:i]):
                if p.event_type == "click":
                    if r.ts - p.ts <= look:
                        exp = float(p.event_id)
                    break
            got = out.loc[r.event_id]
            assert (np.isnan(got) and np.isnan(exp)) or got == exp
            n_attr += not np.isnan(exp)
    assert n_attr >= 1
    assert out.notna().sum() == n_attr
