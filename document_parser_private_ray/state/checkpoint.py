"""Resumable, partitioned execution with per-partition lineage
(north rule: "every partition emits lineage + counters to a checkpoint
table so the job resumes idempotently after failure").

Model: the input corpus is a list of files; partitions are deterministic
contiguous file groups (partition_id = index over the sorted file list).
Each partition runs as its own bounded Ray Dataset pipeline and commits
atomically:

    out_dir/
      parts/part-<id>/...parquet       (written to a tmp dir, then renamed)
      lineage/part-<id>.json           (doc/span/error counters + wall_ms)

On restart, committed partition ids are skipped (idempotent: every stage
is a deterministic pure function of the input rows). The lineage
directory doubles as the metrics table (FIXTURES.md §4 schema) and can
be loaded as a Dataset via ``lineage_table``.

At 100 TB the same layout holds: partitions = input shards (or key
ranges), each a streaming pipeline bounded by the shard size; the
lineage write is tiny and atomic per partition.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, List, Optional

import pyarrow as pa
import pyarrow.compute as pc

LINEAGE_FIELDS = (
    "partition_id", "doc_count", "span_count", "error_count",
    "wall_ms", "status", "run_id",
)


def _partitions(files: List[str], files_per_partition: int) -> List[List[str]]:
    files = sorted(files)
    return [
        files[i : i + files_per_partition]
        for i in range(0, len(files), files_per_partition)
    ]


def committed_partitions(out_dir: str) -> set:
    lineage_dir = os.path.join(out_dir, "lineage")
    if not os.path.isdir(lineage_dir):
        return set()
    done = set()
    for name in os.listdir(lineage_dir):
        if name.startswith("part-") and name.endswith(".json"):
            try:
                with open(os.path.join(lineage_dir, name)) as f:
                    row = json.load(f)
                if row.get("status") == "committed":
                    done.add(int(row["partition_id"]))
            except (ValueError, json.JSONDecodeError):
                continue
    return done


def run_resumable(
    input_files: List[str],
    out_dir: str,
    pipeline_fn: Callable,
    run_id: str = "run-0",
    files_per_partition: int = 4,
    fail_after: Optional[int] = None,
) -> dict:
    """Process partitions not yet committed. ``pipeline_fn(ds) -> ds``
    attaches the transform chain to each partition's Dataset.
    ``fail_after`` kills the run after N partitions (failure-injection
    for resume tests). Returns run summary."""
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "lineage"), exist_ok=True)
    done = committed_partitions(out_dir)
    parts = _partitions(input_files, files_per_partition)

    processed, skipped = 0, 0
    for pid, part_files in enumerate(parts):
        if pid in done:
            skipped += 1
            continue
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} partitions")

        t0 = time.monotonic()
        ds = pipeline_fn(rd.read_parquet(part_files))

        final_dir = os.path.join(out_dir, "parts", f"part-{pid:05d}")
        tmp_dir = final_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)  # leftover from a crashed attempt
        ds.write_parquet(tmp_dir)

        # counters from the written output (streamed, small per partition)
        import pyarrow.dataset as pads

        written = pads.dataset(tmp_dir, format="parquet")
        doc_count, span_count, error_count = 0, 0, 0
        for fragment_batch in written.to_batches(columns=["out_spans", "error"]):
            doc_count += fragment_batch.num_rows
            span_count += len(pc.list_flatten(fragment_batch.column(0)))
            error_count += pc.sum(
                pc.cast(pc.not_equal(fragment_batch.column(1), ""), pa.int64())
            ).as_py() or 0

        if os.path.isdir(final_dir):
            import shutil

            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)  # atomic commit of the data

        lineage_row = {
            "partition_id": pid,
            "doc_count": doc_count,
            "span_count": span_count,
            "error_count": error_count,
            "wall_ms": (time.monotonic() - t0) * 1000.0,
            "status": "committed",
            "run_id": run_id,
        }
        lineage_tmp = os.path.join(out_dir, "lineage", f"part-{pid:05d}.json.tmp")
        with open(lineage_tmp, "w") as f:
            json.dump(lineage_row, f)
        os.rename(lineage_tmp, os.path.join(out_dir, "lineage", f"part-{pid:05d}.json"))
        processed += 1

    return {
        "n_partitions": len(parts),
        "processed": processed,
        "skipped": skipped,
        "run_id": run_id,
    }


def lineage_table(out_dir: str) -> pa.Table:
    rows = []
    lineage_dir = os.path.join(out_dir, "lineage")
    for name in sorted(os.listdir(lineage_dir)):
        if name.endswith(".json"):
            with open(os.path.join(lineage_dir, name)) as f:
                rows.append(json.load(f))
    return pa.Table.from_pylist(rows)


def read_output(out_dir: str):
    """The committed output as one Dataset."""
    import glob

    import ray.data as rd

    parts_dir = os.path.join(out_dir, "parts")
    files = []
    for d in sorted(os.listdir(parts_dir)):
        if d.endswith(".tmp"):
            continue
        files.extend(sorted(glob.glob(os.path.join(parts_dir, d, "*.parquet"))))
    return rd.read_parquet(files)
