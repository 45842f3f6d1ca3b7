"""The shuffle-heavy scaling job's correctness claims, pinned at test
scale: the synthetic event stream is deterministic (same bytes on
rebuild), and sessionize computes the IDENTICAL result checksum under
different partitionings — the property that makes the N-vs-4N speedup
a comparison of equal answers (BASELINE.md round-5 third axis).
"""

import importlib.util
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

N = 100_000


def _checksum(ds) -> tuple[int, int]:
    from complexity_driven_feature_construction_ray.stages.temporal import sessionize

    out = sessionize(ds, key="user_id", ts="ts", gap=1800)

    def part(batch: pa.Table) -> pa.Table:
        s = batch["session_idx"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rows": pa.array([len(s)], type=pa.int64()),
                "sidx": pa.array([int(s.sum())], type=pa.int64()),
            }
        )

    rows = sidx = 0
    for r in out.map_batches(part, batch_format="pyarrow").take_all():
        rows += r["rows"]
        sidx += r["sidx"]
    return rows, sidx


def test_stream_generator_is_replayable(ray_session):
    def first_part(d):
        return sorted(f for f in os.listdir(d) if f.startswith("part_"))[0]

    d1 = bench._write_session_stream(N)
    t1 = pq.read_table(os.path.join(d1, first_part(d1)))
    # force a rebuild into the same path and compare bytes
    shutil.rmtree(d1)
    d2 = bench._write_session_stream(N)
    t2 = pq.read_table(os.path.join(d2, first_part(d2)))
    assert t1.equals(t2)
    # schema and the hot-tier skew shape
    assert t1.schema.names == ["user_id", "ts"]
    uid = t1["user_id"].to_numpy()
    hot = max(10, max(1000, N // 40) // 100)
    hot_share = (uid < hot).mean()
    assert 0.15 < hot_share < 0.25  # ~20% of events in the hot 1%


def test_sessionize_checksum_invariant_under_partitioning(ray_session):
    stream = bench._write_session_stream(N)
    r1 = _checksum(ray.data.read_parquet(stream, override_num_blocks=2))
    r2 = _checksum(ray.data.read_parquet(stream, override_num_blocks=13))
    assert r1 == r2
    assert r1[0] == N
    assert r1[1] > 0  # multi-session users exist at a 30-min gap
