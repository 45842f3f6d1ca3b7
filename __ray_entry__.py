"""Driver contract for the Ray-Data feature-construction engine.

entry(): flagship pipeline (token-table -> search -> backfill ->
as-of/windows) at sf0.001 scale.
queries(): one callable per implemented operator from SURVEY.md §2
(+ the curation ops); each takes sf_dir and returns a Dataset /
DataFrame / Table.
oracle_sql(): matching DuckDB SQL where SQL can express the op;
omitted for LSH/search pipelines (rows-only checks).

Ray is initialised by the driver before import — nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from complexity_driven_feature_construction_ray.pipelines.flagship import run_flagship

    out, _search, _selected = run_flagship(
        3000, c_max=2, sample_rows=1500, use_ray_scoring=True
    )
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from complexity_driven_feature_construction_ray.pipelines.relational import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        QUERIES,
        ensure_tok_oracle_fixtures,
    )

    # the tok_backfill oracle reads a seeded parquet twin of the
    # generated token table from /tmp; write it before the driver's
    # DuckDB pass can run (idempotent, driver-side, ~1s)
    ensure_tok_oracle_fixtures()
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
