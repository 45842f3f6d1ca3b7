"""Distributed connected components (label propagation + pointer jumping).

The dedup family's cluster map (doc -> duplicate-cluster id) is the
connected components of the candidate-pair graph. Driver-side
union-find (stages/dedup.py:_clusters_from_pairs) is fine while the
pair set is LSH-bounded; at 100 TB the pair set itself can be
corpus-scale, so this operator keeps everything distributed:

    label(v) <- min(label(v), min over neighbors u of label(u))   (hop)
    label(v) <- label(label(v))                                   (jump)

Labels start as the node id; the fixpoint label is the component's
minimum node id — deterministic across runs and cluster sizes. The
pointer-jump squares the reach every superstep, so convergence is
O(log diameter) supersteps, not O(diameter).

Each superstep is ONE fused streaming pipeline (messages co-grouped by
node hash -> min hash-aggregate -> jump co-grouped by label) that ends
in a parquet CHECKPOINT, and the next superstep reads the checkpoint
back. The roundtrip is deliberate, not incidental:
- it severs executor lineage/state (chained materialize() in a loop
  degrades super-linearly on Ray 2.49 — measured 2s -> 70s/step by
  step 7; with the checkpoint each step stays flat),
- it makes the iteration resumable mid-algorithm (Pregel-style
  superstep checkpointing — the standard production pattern for
  iterative jobs),
- labels never visit the driver: the only driver-side values are a
  per-step label SUM (labels only decrease when they change, so the
  sum is a strictly-decreasing potential function — unchanged sum ⟺
  converged; no row-level old-vs-new co-group needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tag_edge(batch: pa.Table) -> pa.Table:
    return pa.table({
        "k": batch["u"], "v": batch["v"],
        "lbl": pa.nulls(len(batch), type=pa.int64()),
    })


def _emit(g: pd.DataFrame) -> pd.DataFrame:
    """Per node-hash bucket: join edges with labels, emit neighbor
    messages plus each node's own current label."""
    lab = g[g["v"].isna()][["k", "lbl"]]
    edg = g[g["lbl"].isna()][["k", "v"]]
    m = edg.merge(lab, on="k", how="inner")
    return pd.concat([
        pd.DataFrame({"id": m["v"].to_numpy(np.int64),
                      "cand": m["lbl"].to_numpy(np.int64)}),
        pd.DataFrame({"id": lab["k"].to_numpy(np.int64),
                      "cand": lab["lbl"].to_numpy(np.int64)}),
    ])


def _jump(g: pd.DataFrame) -> pd.DataFrame:
    """Per label-hash bucket: label(v) <- label(label(v))."""
    mapping = g[g["node"].isna()][["k", "lbl2"]]
    holders = g[g["lbl2"].isna()][["k", "node"]]
    m = holders.merge(mapping, on="k", how="left")
    # every label value is itself a labeled node, so lbl2 exists; keep
    # the old label defensively if not
    lbl = np.where(m["lbl2"].isna(), m["k"], m["lbl2"]).astype(np.int64)
    return pd.DataFrame({"id": m["node"].to_numpy(np.int64), "component": lbl})


def connected_components(
    edges,
    nodes=None,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "id",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
):
    """edges: Dataset[(src, dst)] (int64 node ids, undirected);
    nodes: optional Dataset[(id,)] adding isolated vertices.
    Returns Dataset[(id, component)] with component = min node id of
    the component (backed by the final checkpoint)."""
    import shutil
    import tempfile

    import ray.data
    from ray.data.aggregate import Min

    from .temporal import grouped_map

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="cc_", dir="/tmp")

    # undirected: ship each edge both ways ONCE; lazy, re-read per step
    def both_ways(batch: pa.Table) -> pa.Table:
        a = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "u": pa.array(np.concatenate([a, b])),
            "v": pa.array(np.concatenate([b, a])),
        })

    dir_edges = edges.map_batches(both_ways, batch_format="pyarrow")

    # labels start as the node's own id (edge endpoints + extra nodes)
    def init_from_edges(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: pa.array(np.unique(batch["u"].to_numpy()))})

    seeds = dir_edges.map_batches(init_from_edges, batch_format="pyarrow")
    if nodes is not None:
        seeds = seeds.union(nodes.select_columns([node_col]))
    labels = seeds.groupby(node_col).aggregate(Min(node_col, alias_name="component"))
    labels.write_parquet(f"{ckpt}/step_0")
    labels = ray.data.read_parquet(f"{ckpt}/step_0")
    prev_sum = labels.sum("component")

    def tag_label(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch[node_col],
            "v": pa.nulls(len(batch), type=pa.int64()),
            "lbl": batch["component"].cast(pa.int64()),
        })

    def tag_holder(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch["component"].cast(pa.int64()),
            "node": batch[node_col].cast(pa.int64()),
            "lbl2": pa.nulls(len(batch), type=pa.int64()),
        })

    def tag_mapping(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch[node_col].cast(pa.int64()),
            "node": pa.nulls(len(batch), type=pa.int64()),
            "lbl2": batch["component"].cast(pa.int64()),
        })

    for step in range(1, max_iter + 1):
        # hop: messages co-grouped by node, min-combined
        both = dir_edges.map_batches(_tag_edge, batch_format="pyarrow").union(
            labels.map_batches(tag_label, batch_format="pyarrow")
        )
        msgs = grouped_map(both, "k", _emit, batch_format="pandas")
        hopped = msgs.groupby("id").aggregate(Min("cand", alias_name="component"))
        if node_col != "id":
            hopped = hopped.map_batches(
                lambda t: t.rename_columns([node_col, "component"]),
                batch_format="pyarrow",
            )
        # jump: co-group holders (keyed by label) with the mapping
        jp = hopped.map_batches(tag_holder, batch_format="pyarrow").union(
            hopped.map_batches(tag_mapping, batch_format="pyarrow")
        )
        jumped = grouped_map(jp, "k", _jump, batch_format="pandas")
        if node_col != "id":
            jumped = jumped.map_batches(
                lambda t: t.rename_columns([node_col, "component"]),
                batch_format="pyarrow",
            )
        jumped.write_parquet(f"{ckpt}/step_{step}")
        labels = ray.data.read_parquet(f"{ckpt}/step_{step}")
        shutil.rmtree(f"{ckpt}/step_{step - 1}", ignore_errors=True)

        # convergence: labels only ever decrease, so the label sum is a
        # strictly-decreasing potential function — one cheap aggregate
        cur_sum = labels.sum("component")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
