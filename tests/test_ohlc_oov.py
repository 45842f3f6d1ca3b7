"""OHLC resample vs brute force; OOV-rate sanity."""

import numpy as np
import pandas as pd
import ray.data


def test_ohlc_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.stages.temporal import ohlc_agg

    rng = np.random.default_rng(11)
    n = 800
    base = pd.Timestamp("2025-03-01").value // 1000
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(
            base + rng.integers(0, 6 * 3600 * 10**6, n), unit="us"),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "value": rng.integers(0, 500, n).astype(np.float64),
    })
    # force exact-tie timestamps so the event_id tiebreak matters
    pdf.loc[1, ["ts", "user_id"]] = [pdf.loc[0, "ts"], pdf.loc[0, "user_id"]]
    out = (
        ohlc_agg(ray.data.from_pandas(pdf).repartition(7), key="user_id",
                 ts="ts", value="value", width_s=3600, order_col="event_id")
        .to_pandas().sort_values(["user_id", "win"]).reset_index(drop=True)
    )
    b = pdf.copy()
    b["win"] = b["ts"].astype("datetime64[us]").astype(np.int64) // (3600 * 10**6)
    b = b.sort_values(["ts", "event_id"], kind="stable")
    exp = b.groupby(["user_id", "win"]).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n_events=("value", "size"),
    ).reset_index().sort_values(["user_id", "win"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[exp.columns.tolist()], exp, check_dtype=False)


def test_ohlc_null_open_preserved(ray_session):
    """A NULL value at the minimal (ts, order) row must surface as a
    NULL open (SQL first_value semantics), not be skipped for the
    first non-null value."""
    from complexity_driven_feature_construction_ray.stages.temporal import ohlc_agg

    base = pd.Timestamp("2025-03-01")
    pdf = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [base, base + pd.Timedelta(minutes=1), base + pd.Timedelta(minutes=2)],
        "user_id": [7, 7, 7],
        "value": [np.nan, 50.0, 20.0],
    })
    out = ohlc_agg(ray.data.from_pandas(pdf), key="user_id", ts="ts",
                   value="value", width_s=3600, order_col="event_id").to_pandas()
    assert len(out) == 1
    assert pd.isna(out.loc[0, "open"])
    assert out.loc[0, "close"] == 20.0
    assert out.loc[0, "high"] == 50.0 and out.loc[0, "low"] == 20.0
    assert out.loc[0, "n_events"] == 3


def test_oov_rate_sanity(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import d_oov_rate

    out = d_oov_rate("/root/testdata/sf0.001")
    assert (out["n_oov"] <= out["n_tok"]).all()
    assert ((out["oov_rate"] >= 0) & (out["oov_rate"] <= 1)).all()


def test_oov_counts_synthetic(ray_session):
    from complexity_driven_feature_construction_ray.stages.text import vocab_encode

    toks = np.array(["bar", "foo"])
    ids = np.array([1, 0], dtype=np.int32)
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["foo novel bar", "zap zap", ""],
    }))
    out = (vocab_encode(ds, toks, ids, with_ids=False)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tok"].tolist() == [3, 2, 0]
    assert out["n_oov"].tolist() == [1, 2, 0]
