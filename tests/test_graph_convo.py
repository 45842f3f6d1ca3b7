"""d_triangle_count / d_conversation / q_table_checksum vs brute force."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_triangle_count_bruteforce(ray_session):
    from itertools import combinations

    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_triangle_count,
    )

    out = d_triangle_count(SF)
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_suppkey"]
    )
    li = li[li["l_orderkey"] % 16 == 0]
    sp = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    from collections import Counter

    pair_share = Counter()
    for _, g in sp.groupby("l_partkey"):
        for a, b in combinations(sorted(g["l_suppkey"]), 2):
            pair_share[(a, b)] += 1
    edges = {p for p, c in pair_share.items() if c >= 2}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_per_node = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a<b<c counted once, increment all three
                tri_per_node[a] += 1
                tri_per_node[b] += 1
                tri_per_node[c] += 1
    exp = pd.DataFrame(
        sorted(tri_per_node.items()), columns=["suppkey", "n_triangles"]
    )
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_conversation_assembly_bruteforce(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        d_conversation,
    )

    out = d_conversation(SF)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    ).sort_values(["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=30)
    rows = []
    for uid, g in ev.groupby("user_id"):
        sess, prev = -1, None
        convos = {}
        for _, r in g.iterrows():
            if prev is None or r["ts"] - prev > gap:
                sess += 1
            prev = r["ts"]
            convos.setdefault(sess, []).append(r["event_type"])
        for s, types in convos.items():
            rows.append((uid, s, len(types), "|".join(types)))
    exp = pd.DataFrame(rows, columns=["user_id", "session_idx", "n_events", "convo"])
    exp = exp.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_table_checksum_detects_single_row_change(ray_session):
    from complexity_driven_feature_construction_ray.pipelines.relational import (
        q_table_checksum,
    )

    out = q_table_checksum(SF)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    assert int(out.loc[0, "n"]) == len(orders)
    # brute-force recompute with Python big ints
    M = (1 << 61) - 1
    A, B = 1752450205419405103, 1152921504607846959
    s, x = 0, 0
    for k, c, p in orders.itertuples(index=False):
        cents = int(np.floor(p * 100 + 0.5))
        h = (((int(k) * 1000003 + int(c)) * A + B) % M * A + cents) % M
        s = (s + h) % M
        x ^= h
    assert int(out.loc[0, "checksum_sum"]) == s
    assert int(out.loc[0, "checksum_xor"]) == x
    # sensitivity: flipping one row's price changes the sum
    h0 = (((int(orders.iloc[0, 0]) * 1000003 + int(orders.iloc[0, 1])) * A + B) % M * A
          + int(np.floor(orders.iloc[0, 2] * 100 + 0.5))) % M
    h1 = (((int(orders.iloc[0, 0]) * 1000003 + int(orders.iloc[0, 1])) * A + B) % M * A
          + int(np.floor(orders.iloc[0, 2] * 100 + 0.5)) + 1) % M
    assert h0 != h1
