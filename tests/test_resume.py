"""F9 fixture: kill-and-rerun backfill resumes without recomputation."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data

from complexity_driven_feature_construction_ray.functions import raw, unary
from complexity_driven_feature_construction_ray.sources import write_token_table
from complexity_driven_feature_construction_ray.state import resumable_backfill


@pytest.fixture(scope="module")
def input_dir(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("tok_in"))
    write_token_table(d, 4000, num_files=8)
    return d


def _read_all(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    import pyarrow.dataset as pads

    return pads.dataset(files).to_table().sort_by("doc_id")


def test_resume_skips_completed_shards(tmp_path, input_dir, ray_session):
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    n_tok = raw("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512})
    feats = [unary("log", n_tok)]

    out_full = str(tmp_path / "full")
    r1 = resumable_backfill(files, out_full, feats, {}, num_shards=4)
    assert r1["computed"] == [0, 1, 2, 3] and r1["skipped"] == []

    # killed run: only 2 shards complete
    out_killed = str(tmp_path / "killed")
    r2 = resumable_backfill(files, out_killed, feats, {}, num_shards=4, stop_after_shards=2)
    assert r2["computed"] == [0, 1]
    mtimes_before = {
        i: os.path.getmtime(os.path.join(out_killed, f"shard={i:05d}", "_lineage.json"))
        for i in (0, 1)
    }

    # rerun: finishes the rest, does not touch shards 0-1
    r3 = resumable_backfill(files, out_killed, feats, {}, num_shards=4)
    assert r3["skipped"] == [0, 1] and r3["computed"] == [2, 3]
    for i in (0, 1):
        assert os.path.getmtime(
            os.path.join(out_killed, f"shard={i:05d}", "_lineage.json")
        ) == mtimes_before[i]

    a, b = _read_all(out_full), _read_all(out_killed)
    assert a.num_rows == b.num_rows == 4000
    assert np.allclose(
        a["log(n_tok)"].to_numpy(), b["log(n_tok)"].to_numpy()
    )
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


def test_plan_change_invalidates_lineage(tmp_path, input_dir, ray_session):
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    n_tok = raw("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512})
    out = str(tmp_path / "o")
    resumable_backfill(files, out, [unary("log", n_tok)], {}, num_shards=2)
    r = resumable_backfill(files, out, [unary("minus", n_tok)], {}, num_shards=2)
    assert r["skipped"] == [] and r["computed"] == [0, 1]  # different plan -> recompute


def test_partitioned_parquet_sink(ray_session, tmp_path):
    """Hive-partitioned output (one directory per key value): the layout
    that lets a 100-TB run prune at the read and resume per partition."""
    import os

    import ray.data

    from complexity_driven_feature_construction_ray.sources.token_table import (
        token_table_dataset,
    )

    out = str(tmp_path / "by_source")
    token_table_dataset(2000).drop_columns(["tokens"]).write_parquet(
        out, partition_cols=["source"]
    )
    parts = sorted(d for d in os.listdir(out) if d.startswith("source="))
    assert parts == [
        "source=books", "source=chat", "source=code", "source=web", "source=wiki"
    ]
    # partition pruning at the read: only one directory's files load
    web = ray.data.read_parquet(os.path.join(out, "source=web"))
    n_web = web.count()
    assert 0 < n_web < 2000
    total = ray.data.read_parquet(out).count()
    assert total == 2000


def test_lineage_records_stage_metrics(tmp_path, input_dir, ray_session):
    import json

    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    n_tok = raw("n_tok", properties={"min": 1.0, "max": 512.0, "has_zero": False, "distinct": 512})
    out = str(tmp_path / "metrics")
    resumable_backfill(files, out, [unary("log", n_tok)], {}, num_shards=2)
    with open(os.path.join(out, "shard=00000", "_lineage.json")) as fh:
        rec = json.load(fh)
    sm = rec["stage_metrics"]
    # at least one executed operator with its task/block/wall-time
    # accounting, plus the end-to-end throughput figure
    assert sm["operators"], rec
    op = sm["operators"][0]
    assert op["tasks"] >= 1 and op["blocks"] >= 1 and op["seconds"] > 0
    assert sm["rows_per_sec"] is None or sm["rows_per_sec"] > 0
