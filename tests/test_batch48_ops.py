"""Degree assortativity vs brute-force reference at sf0.001."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_assortativity_matches_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_assortativity,
    )

    out = q_assortativity(SF).iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_suppkey", "l_partkey"])
    e = li.drop_duplicates()
    sdeg = e.groupby("l_suppkey").size()
    pdeg = e.groupby("l_partkey").size()
    x = e["l_suppkey"].map(sdeg).to_numpy(np.float64)
    y = e["l_partkey"].map(pdeg).to_numpy(np.float64)
    assert int(out["n_edges"]) == len(e)
    assert abs(out["mean_sdeg"] - x.mean()) < 5e-6
    assert abs(out["mean_pdeg"] - y.mean()) < 5e-6
    r = np.corrcoef(x, y)[0, 1]
    assert abs(out["assortativity"] - r) < 5e-6
    assert -1.0 - 1e-9 <= out["assortativity"] <= 1.0 + 1e-9
