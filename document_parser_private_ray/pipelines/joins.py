"""Distributed join patterns (R3 + the guide's partitioned-hash-join
shape).

``bucketed_join`` is the large-⋈-large pattern for engines without a
native shuffle join: both sides get a ``bucket = key % B`` column
(vectorized), are null-padded to a common schema, tagged, unioned, and
a single ``groupby(bucket).map_groups`` performs the per-bucket join
with the Arrow (Acero) hash-join kernel — ONE all-to-all exchange
co-partitions both sides by construction, and every block stays Arrow
end-to-end (no pandas dtype upcasts, no mixed block types downstream).
Skewed hot keys are handled by raising B (salting a hot key into
sub-buckets composes: bucket on (key, salt)).

(Ray 2.49 ships an experimental ``Dataset.join``; this explicit version
is the portable, skew-controllable primitive the oracle-checked queries
use.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def bucketed_join(
    left,
    right,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
    join_type: str = "inner",
):
    """Hash join of two Datasets on integer key columns (``inner``,
    ``left outer`` or ``full outer``). Non-key column names must be
    disjoint across sides. Outer rows with no bucket-mate still
    surface: every row reaches its bucket group regardless of the other
    side's presence, and the per-bucket Acero join emits it null-padded
    (full-outer right-only rows recover their key through the ``__rk``
    payload carry below)."""
    if join_type not in ("inner", "left outer", "full outer"):
        raise ValueError(f"unsupported join_type {join_type!r}")
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    types = {}
    for name, t in zip(lschema.names, lschema.types):
        types[name] = t
    for name, t in zip(rschema.names, rschema.types):
        types.setdefault(name, t)
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def tag_and_pad(tag: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[key].to_numpy(zero_copy_only=False)
            bucket = pa.array((keys % n_buckets).astype("int32"))
            arrays, names = [], []
            for c in all_cols:
                names.append(c)
                if c in batch.column_names:
                    arrays.append(batch[c])
                else:
                    arrays.append(pa.nulls(len(batch), type=types[c]))
            names += ["__bucket", "__side"]
            arrays += [bucket, pa.array([tag] * len(batch))]
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    lt = left.map_batches(tag_and_pad("L", left_key), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_and_pad("R", right_key), batch_format="pyarrow", zero_copy_batch=True)

    def join_bucket(group: pa.Table) -> pa.Table:
        mask = pc.equal(group["__side"], "L")
        l = group.filter(mask).select(lcols)
        r = group.filter(pc.invert(mask)).select(rcols)
        # Acero drops the right key column; carry a copy through the
        # payload so it survives with correct per-row semantics (equal
        # to the left key on matches, null on outer non-matches).
        r = r.append_column("__rk", pc.cast(r[right_key], types[right_key]))
        out = l.join(r, keys=[left_key], right_keys=[right_key], join_type=join_type)
        if right_key != left_key and right_key not in out.column_names:
            out = out.append_column(right_key, out["__rk"])
        if "__rk" in out.column_names:
            out = out.drop_columns(["__rk"])
        return out.select(all_cols)

    return lt.union(rt).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def order_lineitem_revenue(sf_dir: str, n_buckets: int = 16, k: int = 15):
    """orders ⋈ lineitem (both large) -> top-k orders by line revenue,
    carrying order attributes through the join (provably needs the
    join, not just a groupby).

    Fused shape (r5): lineitem pre-aggregates per-batch partials
    (l_orderkey -> revenue, n) BEFORE the exchange, both sides
    co-partition by orderkey bucket in ONE union-tag exchange, and each
    bucket FINISHES its per-order aggregate (all of an order's rows
    land in one bucket by construction) before the Acero join attaches
    the order attributes — the previous corpus-scale
    ``groupby(o_orderkey)`` AFTER the join paid the per-distinct-key
    cross-block merge cost on top of a second exchange. Only the
    per-order aggregate rows reach the final top-k sort."""
    from ..sources.readers import read_table

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
        override_num_blocks=16,
    )
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet",
        ["l_orderkey", "l_extendedprice", "l_discount"],
        override_num_blocks=16,
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        b = (
            batch["o_orderkey"].to_numpy(zero_copy_only=False) % n_buckets
        ).astype("int32")
        return pa.Table.from_pydict(
            {
                "key": pc.cast(batch["o_orderkey"], pa.int64()),
                "o_orderdate": batch["o_orderdate"],
                "o_orderpriority": batch["o_orderpriority"],
                "revenue": pa.nulls(batch.num_rows, type=pa.float64()),
                "n_lines": pa.nulls(batch.num_rows, type=pa.int64()),
                "__bucket": pa.array(b),
                "__side": pa.array(["O"] * batch.num_rows),
            }
        )

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.Table.from_pydict(
            {"key": pc.cast(batch["l_orderkey"], pa.int64()), "revenue": rev}
        )
        g = t.group_by("key").aggregate([("revenue", "sum"), ("revenue", "count")])
        g = g.rename_columns(["key", "revenue", "n_lines"])
        b = (g["key"].to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        n = g.num_rows
        return pa.Table.from_pydict(
            {
                "key": g["key"],
                "o_orderdate": pa.nulls(n, type=orders.schema().types[1]),
                "o_orderpriority": pa.nulls(n, type=pa.string()),
                "revenue": g["revenue"],
                "n_lines": pc.cast(g["n_lines"], pa.int64()),
                "__bucket": pa.array(b),
                "__side": pa.array(["L"] * n),
            }
        )

    ot = orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    lt = lineitem.map_batches(
        lineitem_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        side = pc.equal(g["__side"], "O")
        o = g.filter(side).select(["key", "o_orderdate", "o_orderpriority"])
        l = g.filter(pc.invert(side)).select(["key", "revenue", "n_lines"])
        empty = pa.Table.from_pydict(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "revenue": pa.array([], type=pa.float64()),
                "n_lines": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=orders.schema().types[1]),
                "o_orderpriority": pa.array([], type=pa.string()),
            }
        )
        if o.num_rows == 0 or l.num_rows == 0:
            return empty
        # finish the per-order aggregate — co-partitioned, so this is
        # the FINAL value, not a partial
        agg = l.group_by("key").aggregate(
            [("revenue", "sum"), ("n_lines", "sum")]
        )
        agg = agg.rename_columns(["key", "revenue", "n_lines"])
        out = agg.join(o, keys=["key"], join_type="inner")
        return pa.Table.from_pydict(
            {
                "o_orderkey": out["key"],
                "revenue": out["revenue"],
                "n_lines": out["n_lines"],
                "o_orderdate": out["o_orderdate"],
                "o_orderpriority": out["o_orderpriority"],
            }
        )

    return (
        ot.union(lt)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def distinct_values(sf_dir: str, table: str = "customer", column: str = "c_mktsegment"):
    """Distinct values of a column (R9) — ``Dataset.unique`` shuffle."""
    from ..sources.readers import read_table

    ds = read_table(f"{sf_dir}/{table}.parquet", [column])
    vals = sorted(ds.unique(column))
    return pa.Table.from_pydict({column: pa.array(vals)})


def bucketed_filter_join(
    left, right, left_key: str, right_key: str, mode: str, n_buckets: int = 16
):
    """Semi / anti join of two Datasets on integer keys — the same
    union-tag-co-partition shape as ``bucketed_join`` (ONE all-to-all
    exchange), but the per-bucket kernel is a vectorized membership
    test (``pc.is_in``) instead of Acero's hash join: left rows whose
    key does (semi) / does not (anti) appear on the right. The right
    side ships only its KEY column through the shuffle."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    lschema = left.schema()
    lcols = list(lschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[left_key].to_numpy(zero_copy_only=False)
        bucket = pa.array((keys % n_buckets).astype("int32"))
        return (
            batch.append_column("__bucket", bucket)
            .append_column("__side", pa.array(["L"] * len(batch)))
        )

    def right_keys_only(batch: pa.Table) -> pa.Table:
        keys = batch[right_key].to_numpy(zero_copy_only=False)
        bucket = pa.array((keys % n_buckets).astype("int32"))
        arrays = [
            pc.cast(batch[right_key], ltypes[left_key])
            if c == left_key
            else pa.nulls(len(batch), type=ltypes[c])
            for c in lcols
        ]
        return pa.Table.from_arrays(
            arrays + [bucket, pa.array(["R"] * len(batch))],
            names=lcols + ["__bucket", "__side"],
        )

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns([right_key]).map_batches(
        right_keys_only, batch_format="pyarrow", zero_copy_batch=True
    )

    def filter_bucket(group: pa.Table) -> pa.Table:
        side = pc.equal(group["__side"], "L")
        l = group.filter(side)
        rkeys = pc.unique(group.filter(pc.invert(side))[left_key])
        hit = pc.is_in(l[left_key], value_set=rkeys)
        mask = hit if mode == "semi" else pc.invert(hit)
        return l.filter(mask).select(lcols)

    return lt.union(rt).groupby("__bucket").map_groups(
        filter_bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def customers_no_urgent_orders(sf_dir: str):
    """Anti join (TPC-H Q22 shape): customers that never placed an
    urgent-priority order, with their segment — sorted by c_custkey.
    The urgency filter runs batch-wise BEFORE the shuffle so only
    matching keys leave the read stage."""
    from ..sources.readers import read_table

    customers = read_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_name", "c_mktsegment"],
        override_num_blocks=8,
    )
    orders = read_table(
        f"{sf_dir}/orders.parquet", ["o_custkey", "o_orderpriority"],
        override_num_blocks=16,
    )

    def urgent_keys(batch: pa.Table) -> pa.Table:
        mask = pc.starts_with(batch["o_orderpriority"], "1")
        return batch.filter(mask).select(["o_custkey"])

    urgent = orders.map_batches(
        urgent_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed_filter_join(
        customers, urgent, "c_custkey", "o_custkey", mode="anti"
    ).sort("c_custkey")


def customers_big_spenders(sf_dir: str):
    """Semi join: customers with at least one fulfilled order above a
    price floor — sorted by c_custkey. Same co-partitioned shuffle as
    the anti join; only the membership polarity differs."""
    from ..sources.readers import read_table

    customers = read_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_name", "c_mktsegment"],
        override_num_blocks=8,
    )
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        ["o_custkey", "o_orderstatus", "o_totalprice"],
        override_num_blocks=16,
    )

    def big_keys(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["o_orderstatus"], "F"),
            pc.greater(batch["o_totalprice"], 150000.0),
        )
        return batch.filter(mask).select(["o_custkey"])

    big = orders.map_batches(big_keys, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_filter_join(
        customers, big, "c_custkey", "o_custkey", mode="semi"
    ).sort("c_custkey")


def order_bigline_histogram(sf_dir: str, qty_floor: float = 45.0):
    """Distribution of big-line counts per order with LEFT OUTER
    semantics — orders with zero qualifying lineitems must appear
    (n_big = 0), which an inner join cannot produce. Fused shape (r5):
    the lineitem side filters and pre-aggregates per batch BEFORE the
    exchange, both sides co-partition by orderkey bucket in ONE
    union-tag exchange, and each bucket FINISHES the per-order count
    (co-partitioned, so the in-bucket sum is final), realizes the
    outer-join zeros with a searchsorted against its order keys, and
    emits <= distinct-count histogram partials — the previous version
    paid a corpus-key groupby AND a second join exchange."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    n_buckets = 16
    # downstream shuffles partition by incoming BLOCK count: fuller read
    # blocks cut the fixed per-exchange cost (the pagerank/Q3 idiom)
    orders = read_table(
        f"{sf_dir}/orders.parquet", ["o_orderkey"], override_num_blocks=16
    )
    lineitem = read_table(
        f"{sf_dir}/lineitem.parquet", ["l_orderkey", "l_quantity"],
        override_num_blocks=16,
    )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = pc.cast(batch["o_orderkey"], pa.int64())
        b = (key.to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return pa.Table.from_pydict(
            {
                "key": key,
                "n": pa.nulls(batch.num_rows, type=pa.int64()),
                "__bucket": pa.array(b),
                "__side": pa.array(["O"] * batch.num_rows),
            }
        )

    def big_line_partials(batch: pa.Table) -> pa.Table:
        big = batch.filter(pc.greater(batch["l_quantity"], qty_floor))
        g = big.select(["l_orderkey"]).group_by("l_orderkey").aggregate(
            [("l_orderkey", "count")]
        )
        g = g.rename_columns(["key", "n"])
        b = (g["key"].to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return pa.Table.from_pydict(
            {
                "key": pc.cast(g["key"], pa.int64()),
                "n": pc.cast(g["n"], pa.int64()),
                "__bucket": pa.array(b),
                "__side": pa.array(["L"] * g.num_rows),
            }
        )

    ot = orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    lt = lineitem.map_batches(
        big_line_partials, batch_format="pyarrow", zero_copy_batch=True
    )

    def hist_bucket(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        side = pc.equal(g["__side"], "O")
        ok = g.filter(side)["key"].to_numpy(zero_copy_only=False)
        l = g.filter(pc.invert(side))
        counts = np.zeros(len(ok), dtype=np.int64)
        if l.num_rows and len(ok):
            agg = l.select(["key", "n"]).group_by("key").aggregate([("n", "sum")])
            lk = agg["key"].to_numpy(zero_copy_only=False)
            ln = agg["n_sum"].to_numpy(zero_copy_only=False)
            order = np.argsort(lk)
            lk, ln = lk[order], ln[order]
            idx = np.minimum(np.searchsorted(lk, ok), len(lk) - 1)
            hit = lk[idx] == ok
            counts[hit] = ln[idx[hit]]
        n_big, n = np.unique(counts, return_counts=True)
        return pa.Table.from_pydict(
            {
                "n_big": pa.array(n_big, type=pa.int64()),
                "n": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ot.union(lt)
        .groupby("__bucket")
        .map_groups(hist_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_big")
        .aggregate(Sum("n", alias_name="n_orders"))
        .sort("n_big")
    )


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-01-01", k: int = 10,
                         num_read_blocks: int | None = 16):
    """TPC-H Q3 shape — a CHAINED multi-way join, each link the cheapest
    exchange that preserves semantics: (1) orders dated before the
    cutoff are SEMI-joined against the segment's customer keys
    (``bucketed_filter_join`` — one co-partition exchange, the customer
    side ships keys only, never names/balances); (2) the survivors meet
    the post-cutoff lineitems in ONE bucketed hash join; (3) revenue is
    floored to integer cents PER LINE before the per-order sum, so the
    total is summation-order-free and the SQL oracle replays it
    bit-for-bit. Filters run at the scan on every input."""
    import numpy as np

    from ..sources.readers import read_table

    cut = np.datetime64(cutoff, "us")

    customers = read_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_mktsegment"],
        override_num_blocks=num_read_blocks,
    )
    cust_keys = customers.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], segment)).select(["c_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    import pyarrow.dataset as pads

    # predicate pushdown: the date filters run INSIDE the parquet scan
    # (row groups skipped via statistics before decode)
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cut.item(),
        override_num_blocks=num_read_blocks,
    )
    orders = bucketed_filter_join(orders, cust_keys, "o_custkey", "c_custkey", "semi")
    orders = orders.map_batches(
        lambda b: b.drop_columns(["o_custkey"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed twice: bloom build + the join below

    # Bloom-prune the probe side BEFORE its exchange: lineitem partials
    # whose order key cannot be in the (date+segment-filtered) build
    # side never enter the groupby/join shuffles; false positives just
    # ride through to the exact join (correctness untouched)
    import ray

    from .bloom import build_bloom, bloom_mask

    bloom_ref = ray.put(build_bloom(orders, "o_orderkey"))

    def line_revenue_partial(batch: pa.Table) -> pa.Table:
        # aggregate BEFORE the join: per-batch per-order partial sums,
        # so the join's right side is order-grain and the post-join
        # groupby disappears (one row per order straight off the join)
        cents = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        t = pa.Table.from_pydict(
            {
                "l_orderkey": batch["l_orderkey"],
                "rev_cents": pa.array(cents, type=pa.int64()),
            }
        )
        g = t.group_by("l_orderkey").aggregate([("rev_cents", "sum")])
        g = g.rename_columns(["l_orderkey", "rev_cents"])
        keep = bloom_mask(
            g["l_orderkey"].to_numpy(zero_copy_only=False),
            ray.get(bloom_ref),
        )
        return g.filter(pa.array(keep))

    from ray.data.aggregate import Sum

    revenue = (
        read_table(
            f"{sf_dir}/lineitem.parquet",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=pads.field("l_shipdate") > cut.item(),
            override_num_blocks=num_read_blocks,
        )
        .map_batches(
            line_revenue_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("l_orderkey")
        .aggregate(Sum("rev_cents", alias_name="revenue_cents"))
    )

    joined = bucketed_join(orders, revenue, "o_orderkey", "l_orderkey")
    return (
        joined.map_batches(
            lambda b: b.select(
                ["o_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["revenue_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def fk_violations(sf_dir: str):
    """Referential-integrity audit — the data-quality gate a pipeline
    runs before trusting a 100 TB drop: for each child->parent
    relationship, the child row count and the number of ORPHANS
    (children whose key has no parent), computed with the keys-only
    anti join (``bucketed_filter_join``: one co-partition exchange per
    relationship, parents ship nothing but key columns). Output is one
    row per relationship."""
    from ..sources.readers import read_table

    rels = [
        ("orders.o_custkey->customer.c_custkey",
         ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("lineitem.l_orderkey->orders.o_orderkey",
         ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("customer.c_nationkey->nation.n_nationkey",
         ("customer", "c_nationkey"), ("nation", "n_nationkey")),
    ]
    out_r, out_n, out_o = [], [], []
    for name, (child, ckey), (parent, pkey) in rels:
        child_ds = read_table(
            f"{sf_dir}/{child}.parquet", [ckey], override_num_blocks=16
        )
        parent_ds = read_table(
            f"{sf_dir}/{parent}.parquet", [pkey], override_num_blocks=16
        )
        n_child = child_ds.count()
        orphans = bucketed_filter_join(
            child_ds, parent_ds, ckey, pkey, "anti"
        ).count()
        out_r.append(name)
        out_n.append(n_child)
        out_o.append(orphans)
    return pa.Table.from_pydict(
        {
            "relationship": pa.array(out_r, type=pa.string()),
            "n_child_rows": pa.array(out_n, type=pa.int64()),
            "n_orphans": pa.array(out_o, type=pa.int64()),
        }
    )


def building_not_big_spenders(sf_dir: str, spend_floor: float = 1_500_000.0):
    """Set algebra (EXCEPT) over derived key sets: BUILDING-segment
    customers MINUS customers whose total order value exceeds the
    floor — composed from the same keys-only co-partition primitives as
    the semi/anti joins: the subtrahend set is itself an aggregate
    (groupby custkey -> filter), and the EXCEPT is one anti
    ``bucketed_filter_join``. Output: (c_custkey, c_acctbal) sorted."""
    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    building = read_table(
        f"{sf_dir}/customer.parquet", ["c_custkey", "c_mktsegment", "c_acctbal"],
        override_num_blocks=8,
    ).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).drop_columns(
            ["c_mktsegment"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    big = (
        read_table(
            f"{sf_dir}/orders.parquet", ["o_custkey", "o_totalprice"],
            override_num_blocks=16,
        )
        .groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total"))
        .map_batches(
            lambda b: b.filter(pc.greater(b["total"], spend_floor)).select(
                ["o_custkey"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    out = bucketed_filter_join(building, big, "c_custkey", "o_custkey", "anti")

    def to_cents(batch: pa.Table) -> pa.Table:
        import numpy as np

        cents = np.floor(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "c_custkey": batch["c_custkey"],
                "acctbal_cents": pa.array(cents, type=pa.int64()),
            }
        )

    return out.map_batches(
        to_cents, batch_format="pyarrow", zero_copy_batch=True
    ).sort("c_custkey")


def orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape — orders strictly above their own
    customer's average order value — decorrelated the classic way: the
    comparison is the DIVISION-FREE integer form
    price_cents * n_orders > sum_cents, so no float average ever exists
    to disagree across engines. Output: per-priority counts of
    above-average orders.

    Fused shape (r5): orders co-partition by custkey bucket in ONE
    exchange; inside each bucket the per-customer aggregate is FINAL
    (all of a customer's orders are co-located), rows flag against it
    via one argsort + searchsorted, and the bucket emits <= #priorities
    partial rows for the tiny final groupby. The previous version built
    a separate per-customer Dataset and joined it back — two exchanges
    plus a re-execution of the orders scan (two lazy consumers of one
    Dataset re-run the upstream)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..sources.readers import read_table

    n_buckets = 32

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
                "price_cents": pa.array(
                    np.floor(
                        b["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                        + 0.5
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
                "__bucket": pa.array((ck % n_buckets).astype("int32")),
            }
        )

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        ["o_custkey", "o_totalprice", "o_orderpriority"],
        override_num_blocks=16,
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def flag_bucket(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        if g.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "o_orderpriority": pa.array([], type=pa.string()),
                    "n_above": pa.array([], type=pa.int64()),
                    "n_total": pa.array([], type=pa.int64()),
                }
            )
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        cents = g["price_cents"].to_numpy(zero_copy_only=False)
        # per-customer (sum, n) — FINAL, the bucket holds every order
        agg = (
            g.select(["o_custkey", "price_cents"])
            .group_by("o_custkey")
            .aggregate([("price_cents", "sum"), ("price_cents", "count")])
        )
        ak = agg["o_custkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(ak)
        ak_s = ak[order]
        sums = agg["price_cents_sum"].to_numpy(zero_copy_only=False)[order]
        ns = agg["price_cents_count"].to_numpy(zero_copy_only=False)[order]
        idx = np.searchsorted(ak_s, ck)
        above = cents * ns[idx] > sums[idx]
        t = pa.Table.from_pydict(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_above": pa.array(above.astype(np.int64), type=pa.int64()),
                "n_total": pa.array(np.ones(len(ck), dtype=np.int64)),
            }
        )
        p = t.group_by("o_orderpriority").aggregate(
            [("n_above", "sum"), ("n_total", "sum")]
        )
        return p.rename_columns(["o_orderpriority", "n_above", "n_total"])

    return (
        orders.groupby("__bucket")
        .map_groups(flag_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_above", alias_name="n_above_avg"),
            Sum("n_total", alias_name="n_orders"),
        )
        .sort("o_orderpriority")
    )


def snapshot_diff(sf_dir: str, n_buckets: int = 16):
    """Dataset-version diff — the incremental-ingest primitive that
    tells a recurring crawl/curation job what changed between two
    corpus snapshots: (doc_id, status) for every added / removed /
    changed document, unchanged docs dropped. Exercises the FULL OUTER
    bucketed join (both sides large, co-partitioned by id hash, ONE
    exchange; only (id, md5) pairs ever shuffle — never text).

    The "current" version derives deterministically from the documents
    table so the op is self-contained and SQL-replayable: docs with
    doc_id%7==3 are deleted, docs with doc_id%11==5 are edited (md5
    over text + '~edit'), and docs with doc_id%13==1 spawn a new
    doc_id+10_000_000 row (md5 over text + '~new'); the snapshot side
    is the table as-is."""
    import numpy as np

    from ..functions.textstats import md5_fingerprint
    from ..sources.readers import read_table

    docs = read_table(
        f"{sf_dir}/documents.parquet", ["doc_id", "text"],
        override_num_blocks=16,
    )

    def current_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_ids, out_fps = [], []
        for i, t in zip(ids, texts):
            i = int(i)
            if i % 7 != 3:
                out_ids.append(i)
                out_fps.append(
                    md5_fingerprint(t + "~edit") if i % 11 == 5 else md5_fingerprint(t)
                )
            if i % 13 == 1:
                out_ids.append(i + 10_000_000)
                out_fps.append(md5_fingerprint(t + "~new"))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "fp": pa.array(out_fps, type=pa.string()),
            }
        )

    def snapshot_side(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "snap_doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "snap_fp": pa.array(
                    [md5_fingerprint(t) for t in batch["text"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    cur = docs.map_batches(current_side, batch_format="pyarrow", zero_copy_batch=True)
    snap = docs.map_batches(snapshot_side, batch_format="pyarrow", zero_copy_batch=True)
    joined = bucketed_join(
        cur, snap, "doc_id", "snap_doc_id",
        n_buckets=n_buckets, join_type="full outer",
    )

    def classify(batch: pa.Table) -> pa.Table:
        # Acero coalesces join keys (right-only rows carry the key in
        # the LEFT key column), so side presence is read off the
        # fingerprint payloads, never the keys.
        status = pc.if_else(
            pc.is_null(batch["snap_fp"]),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(batch["fp"]),
                pa.scalar("removed"),
                pa.scalar("changed"),
            ),
        )
        out = pa.Table.from_pydict(
            {
                "doc_id": pc.coalesce(
                    pc.cast(batch["doc_id"], pa.int64()),
                    pc.cast(batch["snap_doc_id"], pa.int64()),
                ),
                "status": status,
                "__same": pc.equal(batch["fp"], batch["snap_fp"]),
            }
        )
        out = out.filter(
            pc.invert(pc.fill_null(out["__same"], False))
        )
        return out.drop_columns(["__same"])

    return joined.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")
