"""JSON-field extraction incl. malformed/missing payloads."""

import pandas as pd
import pyarrow as pa
import ray.data


def test_json_extract_null_path(ray_session):
    from ray.data.aggregate import Count, Mean

    pdf = pd.DataFrame({
        "event_type": ["a", "a", "a", "b"],
        "props": ['{"k": 10}', "not json", '{"other": 1}', '{"k": 7}'],
    })

    def extract(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["props"].to_pandas())
        k = s.str.extract(r'"k": (\d+)', expand=False).astype("Int64")
        return pa.table({
            "event_type": batch["event_type"],
            "k": pa.array(k, from_pandas=True),
        })

    out = (
        ray.data.from_pandas(pdf).map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Mean("k", alias_name="k_mean"))
        .to_pandas().set_index("event_type")
    )
    # count(*) counts rows regardless of NULL k; mean skips NULLs (SQL avg)
    assert out.loc["a", "n"] == 3
    assert out.loc["a", "k_mean"] == 10.0
    assert out.loc["b", "k_mean"] == 7.0
