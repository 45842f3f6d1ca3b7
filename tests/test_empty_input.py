"""Empty-input (0-row tables) behavior of the queries the degenerate
gate flagged as SILENTLY wrong (tools/check_empty.py): the engine must
match the SQL twin's shape on a zero-row table — not emit NaN rows a
group-by twin wouldn't, and not emit 0 where sum()/bit_xor() are NULL.

Ray Data drops 0-row blocks (even from from_arrow), so most pipelines
RAISE on empty input — loud, acceptable. These four used to return
wrong DATA; that class is pinned here.
"""

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")

from check_empty import build_empty_fixture  # noqa: E402

from complexity_driven_feature_construction_ray.pipelines.relational import (  # noqa: E402
    q_corr,
    q_profile,
    q_table_checksum,
    t_funnel,
)


def _pd(obj):
    return obj if isinstance(obj, pd.DataFrame) else obj.to_pandas()


def test_q_corr_empty_emits_no_rows(ray_session):
    sf = build_empty_fixture()
    got = _pd(q_corr(sf))
    assert len(got) == 0
    assert list(got.columns) == ["col_a", "col_b", "corr"]


def test_t_funnel_empty_emits_zero_count_per_step(ray_session):
    sf = build_empty_fixture()
    got = _pd(t_funnel(sf)).sort_values("step").reset_index(drop=True)
    assert list(got["step"]) == [1, 2, 3]
    assert list(got["event_type"]) == ["view", "click", "purchase"]
    assert list(got["n_users"]) == [0, 0, 0]


def test_q_profile_empty_emits_null_row_per_column(ray_session):
    sf = build_empty_fixture()
    got = _pd(q_profile(sf)).sort_values("col").reset_index(drop=True)
    assert list(got["col"]) == ["user_id", "value"]
    assert list(got["n"]) == [0, 0]
    assert list(got["n_null"]) == [0, 0]
    assert got[["v_min", "v_max", "v_mean"]].isna().all().all()


def test_q_table_checksum_empty_is_null_not_zero(ray_session):
    sf = build_empty_fixture()
    got = _pd(q_table_checksum(sf))
    assert len(got) == 1
    assert int(got["n"].iloc[0]) == 0
    assert np.isnan(got["checksum_sum"].iloc[0])
    assert np.isnan(got["checksum_xor"].iloc[0])
