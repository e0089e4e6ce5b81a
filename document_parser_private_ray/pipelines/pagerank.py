"""Distributed PageRank (Brin-Page'98 — public method) in exact
integer fixed-point arithmetic, over the customer-supplier bipartite
graph derived from orders ⋈ lineitem.

Why integer fixed-point: float PageRank accumulates in whatever order
the shuffle delivers contributions, so cross-engine (and cross-run)
sums differ in the last ulps. This variant does every step in int64
micro-units with floor division — contribution of node u to each
neighbor is ``score_u * 85 // (100 * deg_u)`` and the damping base is
a flat ``150_000`` — so addition order is irrelevant and a DuckDB
oracle replays the scores bit-for-bit with the same unrolled
iterations.

Scale shape (the iterative-algorithm pattern, same skeleton as
connected components):

* edge build: ONE bucketed hash join orders ⋈ lineitem, distinct
  (cust, supp) via groupby, bidirectional edges with disjoint node ids
  (cust -> 2k, supp -> 2k+1);
* degrees: one groupby(src) count, attached to the edge relation by a
  co-partition bucketed join ONCE — iterations reuse the joined
  relation;
* per iteration: ONE co-partition bucketed join (edges+deg) ⋈ scores
  on src, a vectorized contribution map, ONE groupby(dst) sum, a
  constant teleport add. Lineage is cut per iteration so the logical
  plan stays O(1) deep;
* driver state: none (scores live as a Dataset).

Reference seed: none — the reference is a single-document CLI
(/root/reference/main.py:138-192); this operator belongs to the
iterative-graph family the engine adds.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

DAMP_NUM = 85          # 0.85 damping as a rational
DAMP_DEN = 100
TELEPORT_MICRO = 150_000   # (1 - 0.85) in micro-units
INIT_MICRO = 1_000_000


def _cut(ds):
    import ray.data as rd

    return rd.from_arrow_refs(ds.materialize().to_arrow_refs())


def distinct_cust_supp_pairs(sf_dir: str, n_buckets: int = 16):
    """Distinct (cust, supp) relation from orders ⋈ lineitem.

    The dedup runs at pair-hash-bucket grain: per-batch local distinct
    (each order's ~4 lines collapse before the exchange), then ONE
    vectorized Arrow ``group_by`` per 64-way bucket via ``map_groups``.
    Ray's ``groupby(keys).aggregate()`` pays its cross-block merge cost
    per distinct key when keys repeat across blocks — measured 13.0 s
    for the ~590k sf0.1 pairs vs 0.25 s for this shape, same exchange."""
    from ..sources.readers import read_table
    from .joins import bucketed_join

    # coarse read blocks: every downstream exchange partitions by the
    # incoming block count, and this graph is node-count-small — fewer,
    # fuller blocks cut the per-exchange fixed cost
    orders = read_table(
        f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey"],
        override_num_blocks=n_buckets,
    )
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_suppkey"],
        override_num_blocks=n_buckets,
    )
    joined = bucketed_join(
        orders, lineitem, "o_orderkey", "l_orderkey", n_buckets=n_buckets
    )

    def local_pairs(t: pa.Table) -> pa.Table:
        g = pa.Table.from_pydict(
            {
                "c": pc.cast(t["o_custkey"], pa.int64()),
                "s": pc.cast(t["l_suppkey"], pa.int64()),
            }
        ).group_by(["c", "s"]).aggregate([])
        c = g["c"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        return g.append_column(
            "pb", pa.array(((c * 31 + s) & 63).astype("int32"))
        )

    def distinct_bucket(group: pa.Table) -> pa.Table:
        return group.select(["c", "s"]).group_by(["c", "s"]).aggregate([])

    return (
        joined.map_batches(
            local_pairs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pb")
        .map_groups(
            distinct_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def build_bipartite_edges(sf_dir: str, n_buckets: int = 16):
    """Bidirectional (src, dst) edges between customer nodes (2k) and
    supplier nodes (2k+1) for every distinct (cust, supp) order-line
    relationship."""
    pairs = distinct_cust_supp_pairs(sf_dir, n_buckets=n_buckets)

    def to_edges(t: pa.Table) -> pa.Table:
        c = pc.multiply(t["c"], pa.scalar(2, type=pa.int64()))
        s = pc.add(
            pc.multiply(t["s"], pa.scalar(2, type=pa.int64())),
            pa.scalar(1, type=pa.int64()),
        )
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        return pa.Table.from_pydict(
            {
                "src": pa.concat_arrays([c, s]),
                "dst": pa.concat_arrays([s, c]),
            }
        )

    return pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)


def _sum_by_int64(keys, vals):
    """Exact int64 group-sum: (unique_keys, sums) via sort + reduceat.
    Addition order is irrelevant for integers, so this matches any
    other grouping of the same terms bit-for-bit."""
    import numpy as np

    if len(keys) == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    vs = vals[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1)
    )
    return ks[starts], np.add.reduceat(vs, starts)


def supplier_pagerank(sf_dir: str, n_iters: int = 3, k: int = 20,
                      n_buckets: int = 16):
    """Top-k supplier nodes by integer PageRank after ``n_iters``
    synchronous iterations: (s_suppkey, score_micro), ordered by
    (score desc, suppkey).

    Fused-exchange shape: every iteration is ONE groupby(node-bucket)
    exchange. Edges carry bucket(src); contributions carry
    bucket(dst). Inside a bucket group the nodes receiving
    contributions ARE the nodes whose out-edges live here (bucket is a
    pure function of the node id), so one ``map_groups`` call sums the
    incoming mass, adds the teleport term, recomputes the local
    degrees, and immediately emits the NEXT round's contributions —
    degree join and score groupby collapse into the same exchange.
    The arithmetic is int64 fixed-point throughout, so the fused
    grouping reproduces the unrolled DuckDB oracle bit-for-bit."""
    import numpy as np

    B = np.int64(n_buckets)

    def _contrib_table(dst, c):
        return pa.Table.from_pydict(
            {
                "key": pa.array((dst % B).astype("int32")),
                "a": pa.array(dst, type=pa.int64()),
                "v": pa.array(c, type=pa.int64()),
                "b": pa.array(np.zeros(len(dst), dtype=np.int64)),
                "kind": pa.array(
                    np.ones(len(dst), dtype=np.int8)
                ),
            }
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "key": pa.array((src % B).astype("int32")),
                "a": pa.array(src, type=pa.int64()),
                "v": pa.array(np.zeros(len(src), dtype=np.int64)),
                "b": pa.array(dst, type=pa.int64()),
                "kind": pa.array(np.zeros(len(src), dtype=np.int8)),
            }
        )

    edges_b = _cut(
        build_bipartite_edges(sf_dir, n_buckets=n_buckets).map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def first_round(group: pa.Table) -> pa.Table:
        # all rows are edges; initial score is a constant, so the
        # first contributions need only the in-group degrees
        src = group["a"].to_numpy(zero_copy_only=False)
        dst = group["b"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(src, return_inverse=True)
        deg = np.bincount(inv).astype(np.int64)
        c = (INIT_MICRO * DAMP_NUM) // (DAMP_DEN * deg[inv])
        return _contrib_table(dst, c)

    def fused_round(emit_scores: bool):
        def fn(group: pa.Table) -> pa.Table:
            kind = group["kind"].to_numpy(zero_copy_only=False)
            a = group["a"].to_numpy(zero_copy_only=False)
            em = kind == 0
            c_node = a[~em]
            c_val = group["v"].to_numpy(zero_copy_only=False)[~em]
            nodes, sums = _sum_by_int64(c_node, c_val)
            score = sums + TELEPORT_MICRO
            if emit_scores:
                return pa.Table.from_pydict(
                    {
                        "node": pa.array(nodes, type=pa.int64()),
                        "score": pa.array(score, type=pa.int64()),
                    }
                )
            src = a[em]
            dst = group["b"].to_numpy(zero_copy_only=False)[em]
            su, inv = np.unique(src, return_inverse=True)
            deg = np.bincount(inv).astype(np.int64)
            # every src in this bucket received mass (edges are
            # bidirectional), so the lookup is total; validate anyway
            # rather than misattribute on a malformed graph
            idx = np.searchsorted(nodes, su)
            ok = (idx < len(nodes)) & (
                nodes[np.minimum(idx, len(nodes) - 1)] == su
            )
            if not ok.all():
                keep = ok[inv]
                src, dst, inv = src[keep], dst[keep], inv[keep]
                su_ok = np.flatnonzero(ok)
                remap = np.full(len(su), -1, dtype=np.int64)
                remap[su_ok] = np.arange(len(su_ok))
                inv = remap[inv]
                idx = idx[ok]
                deg = deg[ok]
            s_src = score[idx][inv]
            c = (s_src * DAMP_NUM) // (DAMP_DEN * deg[inv])
            return _contrib_table(dst, c)

        return fn

    # iteration 1's join half: contributions from the constant initial
    # scores — one exchange over the edges alone
    contribs = _cut(
        edges_b.groupby("key").map_groups(
            first_round, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    # per-iteration cuts: measured 1.8x faster than one deep lazy plan
    for _ in range(n_iters - 1):
        contribs = _cut(
            edges_b.union(contribs)
            .groupby("key")
            .map_groups(
                fused_round(emit_scores=False),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        )
    scores = contribs.groupby("key").map_groups(
        fused_round(emit_scores=True),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def suppliers_only(t: pa.Table) -> pa.Table:
        node = pc.cast(t["node"], pa.int64())
        mask = pc.equal(pc.bit_wise_and(node, pa.scalar(1, type=pa.int64())),
                        pa.scalar(1, type=pa.int64()))
        sub = t.filter(mask)
        skey = pc.divide(
            pc.subtract(pc.cast(sub["node"], pa.int64()),
                        pa.scalar(1, type=pa.int64())),
            pa.scalar(2, type=pa.int64()),
        )
        return pa.Table.from_pydict(
            {
                "s_suppkey": skey,
                "score_micro": pc.cast(sub["score"], pa.int64()),
            }
        )

    return (
        scores.map_batches(suppliers_only, batch_format="pyarrow",
                           zero_copy_batch=True)
        .sort(["score_micro", "s_suppkey"], descending=[True, False])
        .limit(k)
    )


def cosupplier_pairs(sf_dir: str, k: int = 15, max_deg: int = 32,
                     n_buckets: int = 16):
    """Two-hop graph co-occurrence: supplier pairs ranked by how many
    customers they share — the collaborative-filtering join over the
    same distinct (cust, supp) relation PageRank builds. Hot customers
    are DEGREE-CAPPED deterministically (each customer contributes
    pairs only among its ``max_deg`` smallest suppliers — the
    collocation-style candidate bound, so no group explodes
    quadratically); pair counts pre-aggregate per group before the tiny
    final groupby."""
    import numpy as np

    pairs = distinct_cust_supp_pairs(sf_dir, n_buckets=n_buckets)

    # group at BUCKET grain, not per customer: map_groups emits one
    # block per group, and 100k one-customer blocks would drown the
    # downstream operators in per-block overhead; a c%64 bucket holds
    # many customers and the explosion loops them inside one call,
    # emitting one pre-counted block per bucket
    pairs = pairs.map_batches(
        lambda t: t.append_column(
            "bucket",
            pc.cast(
                pc.bit_wise_and(
                    pc.cast(t["c"], pa.int64()), pa.scalar(63, type=pa.int64())
                ),
                pa.int32(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def explode_bucket(group: pa.Table) -> pa.Table:
        c = group["c"].to_numpy(zero_copy_only=False)
        sup = group["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sup, c))
        c, sup = c[order], sup[order]
        bounds = np.flatnonzero(np.diff(c)) + 1
        out_a, out_b = [], []
        for lo, hi in zip(
            np.concatenate(([0], bounds)),
            np.concatenate((bounds, [len(c)])),
        ):
            s_list = sup[lo : min(hi, lo + max_deg)]
            if len(s_list) < 2:
                continue
            ia, ib = np.triu_indices(len(s_list), k=1)
            out_a.append(s_list[ia])
            out_b.append(s_list[ib])
        if not out_a:
            return pa.Table.from_pydict(
                {
                    "s_a": pa.array([], type=pa.int64()),
                    "s_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        t = pa.Table.from_pydict(
            {
                "s_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "s_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "n": pa.array(
                    np.ones(sum(len(x) for x in out_a), dtype=np.int64)
                ),
            }
        )
        g = t.group_by(["s_a", "s_b"]).aggregate([("n", "sum")])
        return g.rename_columns(["s_a", "s_b", "n"])

    exploded = pairs.groupby("bucket").map_groups(
        explode_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # final reduce at BUCKET grain again: Ray's groupby().aggregate()
    # pays per-distinct-group overhead (~0.1 ms/group — 500k pair keys
    # would cost ~45 s); a pair-hash bucket co-partition plus ONE
    # vectorized Arrow group_by per bucket does the same exchange in
    # 64 calls
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["s_a"].to_numpy(zero_copy_only=False)
        b = t["s_b"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "pb", pa.array(((a * 31 + b) & 63).astype("int32"))
        )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        g = (
            group.select(["s_a", "s_b", "n"])
            .group_by(["s_a", "s_b"])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["s_a", "s_b", "n_shared_customers"])

    return (
        exploded.map_batches(
            add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pb")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .sort(
            ["n_shared_customers", "s_a", "s_b"], descending=[True, False, False]
        )
        .limit(k)
    )
