"""tok_crop / d_html_strip / d_wilson_ci / q_moments vs brute force."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_tok_crop_bounds_and_first_token(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import tok_crop
    from complexity_driven_feature_construction_ray.sources.token_table import (
        token_table_arrow,
    )

    out = tok_crop(SF).to_pandas().set_index("doc_id")
    src = token_table_arrow(3000).to_pandas().set_index("doc_id")
    assert len(out) == 3000
    for did, r in out.head(200).iterrows():
        toks = src.loc[did, "tokens"]
        n = len(toks)
        assert r["n_tok"] == n
        assert r["crop_len"] == min(n, 64)
        if n > 64:
            assert 0 <= r["crop_start"] <= n - 64
        else:
            assert r["crop_start"] == 0
        assert r["crop_first_tok"] == toks[r["crop_start"]]
    # deterministic across runs
    out2 = tok_crop(SF).to_pandas().set_index("doc_id")
    pd.testing.assert_frame_equal(out.sort_index(), out2.sort_index())
    # long docs actually get non-zero starts somewhere (hash spreads)
    longs = out[out["n_tok"] > 64]
    if len(longs) > 20:
        assert (longs["crop_start"] > 0).mean() > 0.5


def test_html_strip_roundtrip(ray_session):
    import re

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_html_strip,
    )

    out = d_html_strip(SF).to_pandas().set_index("doc_id")
    doc = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for _, r in doc.head(40).iterrows():
        t = r["text"] or ""
        if r["doc_id"] % 5 == 0:
            w = f'<div class="t"><p>{t}</p></div><script>junk()</script>'
        else:
            w = t
        ns = re.sub(r"<script>[^<]*</script>", "", w)
        n_tags = len(re.findall(r"<[^>]*>", ns)) + (1 if r["doc_id"] % 5 == 0 else 0)
        clean = re.sub(r"<[^>]*>", "", ns)
        row = out.loc[r["doc_id"]]
        assert row["n_tags"] == n_tags
        assert row["clean_len"] == len(clean)
        # stripping recovers the original text for injected docs
        if r["doc_id"] % 5 == 0:
            assert clean == t
            assert row["changed"]


def test_wilson_interval_properties(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_wilson_ci,
    )

    out = d_wilson_ci(SF)
    assert (out["wilson_lo"] <= out["p_keep"] + 1e-9).all()
    assert (out["p_keep"] <= out["wilson_hi"] + 1e-9).all()
    assert ((out["wilson_lo"] >= -1e-9) & (out["wilson_hi"] <= 1 + 1e-9)).all()
    # interval width shrinks with n: recompute one source by hand
    r = out.iloc[0]
    p, n = r["kept"] / r["n"], float(r["n"])
    half = 1.96 * np.sqrt((p * (1 - p) + 1.96**2 / (4 * n)) / n)
    lo = (p + 1.96**2 / (2 * n) - half) / (1 + 1.96**2 / n)
    hi = (p + 1.96**2 / (2 * n) + half) / (1 + 1.96**2 / n)
    assert abs(r["wilson_lo"] - lo) < 2e-6
    assert abs(r["wilson_hi"] - hi) < 2e-6


def test_moments_vs_numpy(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import q_moments

    out = q_moments(SF).set_index("l_returnflag")
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_discount"]
    )
    for g, gg in li.groupby("l_returnflag"):
        x = gg["l_discount"].to_numpy(np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        assert abs(out.loc[g, "skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(out.loc[g, "excess_kurtosis"] - (m4 / m2**2 - 3)) < 1e-5
        assert out.loc[g, "n"] == len(x)
