"""Data-sized hash-bucket counts for the shuffle/grouped-map family.

Every windowed / as-of / grouped-map / dedup stage hashes entities into
B buckets and processes each bucket as ONE in-memory table inside
groupby(bucket).map_groups. A CPU-derived B (2xCPUs) is a scale
killer: at 100 TB each bucket would be ~dataset/64 and the map_groups
task OOMs. B must scale with DATA SIZE — rows / target-rows-per-bucket
— with the CPU count only as a parallelism floor.

Row counts come from Dataset metadata only (`ds._meta_count()`), which
is free for read_parquet / from_pandas / repartition lineages and None
for map lineages — callers that transform before bucketing either pass
`num_rows`/`num_buckets` explicitly or fall back to the CPU floor.
"""

from __future__ import annotations

import math

# One bucket materializes as a single Arrow table in a map_groups task.
# 250k rows of ~1 KiB documents ~= 256 MiB — safely inside a worker
# heap at concurrency x per-task overhead; override per call for wide
# payloads (images) via target_rows.
TARGET_ROWS_PER_BUCKET = 250_000


def cpu_floor() -> int:
    """Parallelism floor: 2x cluster CPUs (min 8) so small inputs still
    fan out across the machine."""
    try:
        import ray

        return max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:  # pragma: no cover
        return 8


def data_sized_buckets(
    num_rows: int | None, *, target_rows: int = TARGET_ROWS_PER_BUCKET
) -> int:
    """Bucket count for `num_rows` rows: grows linearly with data past
    the CPU floor so per-bucket memory stays bounded at any scale."""
    floor = cpu_floor()
    if not num_rows or num_rows <= 0:
        return floor
    return max(floor, math.ceil(num_rows / target_rows))


def _cheap_count(ds) -> int | None:
    """Row count from plan metadata only — never executes the pipeline."""
    try:
        n = ds._meta_count()
        return int(n) if n is not None else None
    except Exception:  # pragma: no cover - internal API drift guard
        return None


def default_buckets(
    *datasets,
    num_rows: int | None = None,
    target_rows: int = TARGET_ROWS_PER_BUCKET,
) -> int:
    """Bucket count for a shuffle stage over `datasets` (summed rows).

    Prefers an explicit `num_rows` hint; else sums the metadata counts
    of the inputs (ignoring those without one); else the CPU floor.
    """
    if num_rows is None:
        counts = [_cheap_count(ds) for ds in datasets]
        known = [c for c in counts if c is not None]
        num_rows = sum(known) if known else None
    return data_sized_buckets(num_rows, target_rows=target_rows)
