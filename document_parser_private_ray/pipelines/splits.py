"""Deterministic dataset splitting for training pipelines.

``dataset_split`` assigns every document to train/val/test by a stable
content-independent hash of its id (md5, first 8 digest bytes
little-endian — bit-identical to DuckDB's ``md5_number_upper`` so the
driver oracle can recompute the assignment). The split is a pure
per-row map: no shuffle, no state, reproducible across runs, machines
and engines — the property a 100 TB corpus split actually needs (a
random_sample split changes membership every run; a mod-on-row-index
split changes when the corpus is re-partitioned).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _read_ids(sf_dir: str):
    from ..sources.readers import read_table

    return read_table(f"{sf_dir}/documents.parquet", ["doc_id"])


def split_of(key: str, train_buckets: int = 8, val_buckets: int = 1) -> str:
    """train/val/test by md5 bucket in [0, 10): [0,8) train, 8 val, 9 test
    (defaults). == DuckDB md5_number_upper(key) % 10."""
    b = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little") % 10
    if b < train_buckets:
        return "train"
    if b < train_buckets + val_buckets:
        return "val"
    return "test"


def dataset_split(sf_dir: str):
    """(doc_id, split) assignment table over the documents corpus."""

    def assign(batch: pa.Table) -> pa.Table:
        splits = [split_of(str(i)) for i in batch["doc_id"].to_pylist()]
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(splits, type=pa.string())],
            names=["doc_id", "split"],
        )

    return (
        _read_ids(sf_dir)
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def split_counts(sf_dir: str):
    """Rollup: documents per split (sanity check of the 80/10/10 shape)."""
    from ray.data.aggregate import Count

    return (
        dataset_split(sf_dir)
        .groupby("split")
        .aggregate(Count(alias_name="n_docs"))
        .sort("split")
    )
