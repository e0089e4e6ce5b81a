"""Cluster job entrypoint (north rule: "runs via ray job submit on a
fixed-size multi-node Ray cluster").

Submit the flagship parse chain as a Ray job:

    ray job submit --working-dir . -- \
        python -m document_parser_private_ray.job \
            --input /data/corpus --output /data/parsed --run-id run-1

The job is resumable: output is committed per partition with lineage
counters (``state/checkpoint.py``); re-submitting the same command after
a failure skips committed partitions. Ray is initialised only if the
driver hasn't already done so (``ray job submit`` runs this script on
the cluster's head node where ``ray.init()`` attaches to the running
cluster; under the test harness the session fixture owns Ray).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _auto_pool(requested: int) -> int:
    """Actor-pool size: leave ~4 CPUs of headroom for read/write tasks
    (the bench-tuned rule; see bench.run_headline)."""
    if requested > 0:
        return requested
    import ray

    n = int(ray.cluster_resources().get("CPU", 8))
    return max(2, int(n * 0.75), n - 4)


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(
        prog="document_parser_private_ray.job",
        description="Resumable corpus parse job (read -> parse chain -> "
        "partition-committed parquet with lineage).",
    )
    p.add_argument("--input", required=True, help="corpus directory of parquet files")
    p.add_argument("--output", required=True, help="output directory (parts/ + lineage/)")
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--files-per-partition", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=0, help="actor pool size (0 = auto)")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--with-pii", action="store_true")
    p.add_argument(
        "--warm-sample", type=int, default=2000,
        help="documents sampled for the driver warm-cache pass (0 = off)",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"))

    from .pipelines.resume import parse_resumes, read_corpus
    from .state.checkpoint import committed_partitions, lineage_table, run_resumable

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet files under {args.input}")

    pool = _auto_pool(args.concurrency)

    warm_ref = None
    if args.warm_sample > 0:
        # one driver-side oracle pass over a deterministic sample; the
        # resulting pure-function memo caches are broadcast once and
        # seed every actor at steady-state throughput (BASELINE.md)
        from .oracle.document import DocumentOracle

        oracle = DocumentOracle(with_pii=args.with_pii)
        sample = read_corpus(files[0]).limit(args.warm_sample)
        for row in sample.iter_rows():
            spans = row["spans"] or []
            try:
                oracle.process(
                    row["doc_id"],
                    [s["kind"] for s in spans],
                    [s["text"] for s in spans],
                    [s["media_ref"] for s in spans],
                )
            except Exception:
                pass  # poison rows are handled in-stage
        warm_ref = ray.put(oracle.export_caches())

    def pipeline_fn(ds):
        return parse_resumes(
            ds,
            with_pii=args.with_pii,
            concurrency=pool,
            batch_size=args.batch_size,
            warm_caches=warm_ref,
        )

    summary = run_resumable(
        files,
        args.output,
        pipeline_fn,
        run_id=args.run_id,
        files_per_partition=args.files_per_partition,
    )
    lineage = lineage_table(args.output)
    summary["committed_partitions"] = len(committed_partitions(args.output))
    summary["doc_count"] = sum(lineage["doc_count"].to_pylist())
    summary["span_count"] = sum(lineage["span_count"].to_pylist())
    summary["error_count"] = sum(lineage["error_count"].to_pylist())
    summary["actor_pool"] = pool
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
