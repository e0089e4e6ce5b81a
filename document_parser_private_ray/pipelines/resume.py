"""The flagship pipeline: interleaved-span corpus -> parsed resumes +
output spans (north rule), expressed Ray-Data-first.

    read (Lance/Parquet, pruned)
      -> [optional skew pre-pass: est_cost column, vectorized]
      -> map_batches(ParseDocuments, actor pool)   # the whole per-doc chain
      -> write_parquet / downstream aggregates

Skew: documents are heavy-tailed (FIXTURES §1). The pipeline keeps
batches small for the parse stage so the streaming executor
load-balances many small tasks across the pool (dynamic work stealing);
``route_by_cost`` additionally sends pathological documents (giant
multi-thousand-span CVs) through a batch_size=1 branch so one monster
never stalls a full batch. Routing is a cheap vectorized filter on the
est_cost column computed in one pass.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.compute as pc

from ..stages.parse import ParseDocuments, add_cost_column


def read_corpus(path: str, columns=("doc_id", "spans")):
    """Read the spans table. Prefers Lance when available (the logical
    format of the north rule); falls back to Parquet (sandbox physical
    format — no pylance wheel offline, SURVEY §1.5)."""
    import ray.data as rd

    if path.endswith(".lance"):
        return rd.read_lance(path, columns=list(columns))
    return rd.read_parquet(path, columns=list(columns))


def parse_resumes(
    ds,
    data_dir: Optional[str] = None,
    today=None,
    with_pii: bool = False,
    concurrency=None,
    batch_size: int = 32,
    skew_threshold: Optional[int] = None,
):
    """Attach the parse chain to a spans Dataset. ``concurrency`` sizes
    the actor pool (None -> Ray sizes tasks elastically via a stateless
    wrapper is NOT used: state must load once, so default to (2, 8))."""
    fn_kwargs = dict(data_dir=data_dir, today=today, with_pii=with_pii)
    pool = concurrency if concurrency is not None else (2, 8)

    if skew_threshold:
        costed = ds.map_batches(add_cost_column, batch_format="pyarrow")
        small = costed.map_batches(
            lambda t: t.filter(pc.less_equal(t["est_cost"], skew_threshold)).drop_columns(["est_cost"]),
            batch_format="pyarrow",
        )
        large = costed.map_batches(
            lambda t: t.filter(pc.greater(t["est_cost"], skew_threshold)).drop_columns(["est_cost"]),
            batch_format="pyarrow",
        )
        parsed_small = small.map_batches(
            ParseDocuments,
            fn_constructor_kwargs=fn_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
        )
        parsed_large = large.map_batches(
            ParseDocuments,
            fn_constructor_kwargs=fn_kwargs,
            batch_format="pyarrow",
            batch_size=1,
            concurrency=(1, 2),
        )
        return parsed_small.union(parsed_large)

    return ds.map_batches(
        ParseDocuments,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
    )


def resume_rollup(parsed):
    """Corpus-level aggregate over parsed output (R2-style): per-section
    span counts + error count — a small, driver-safe result."""
    import pyarrow as pa

    def count_batch(batch: pa.Table) -> pa.Table:
        kinds = pc.struct_field(pc.list_flatten(batch["out_spans"]), "kind")
        vc = kinds.value_counts()
        rows = [
            {"kind": s["values"], "n": s["counts"]} for s in vc.to_pylist()
        ]
        errors = pc.sum(
            pc.cast(pc.not_equal(batch["error"], ""), pa.int64())
        ).as_py() or 0
        rows.append({"kind": "__error__", "n": errors})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("kind", pa.string()), ("n", pa.int64())])
        )

    from ray.data.aggregate import Sum

    # partial counts per batch (tiny) -> global groupby over partials
    return (
        parsed.map_batches(count_batch, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("n", alias_name="count"))
    )
