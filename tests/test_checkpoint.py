"""Resumable partitioned execution: failure injection + restart must
produce byte-identical output to an uninterrupted run, with no
partition processed twice (FIXTURES.md §4)."""

import os

import pytest

from document_parser_private_ray.sources.corpus import write_corpus_local
from document_parser_private_ray.state.checkpoint import (
    committed_partitions,
    lineage_table,
    read_output,
    run_resumable,
)

N_DOCS = 60


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "spans"
    write_corpus_local(str(path), N_DOCS, seed=42, rows_per_file=10)  # 6 files
    return sorted(str(path / f) for f in os.listdir(path))


def _pipeline(ds):
    from document_parser_private_ray.pipelines.resume import parse_resumes

    return parse_resumes(ds, concurrency=(1, 2), batch_size=16)


def _collect(out_dir):
    rows = {r["doc_id"]: r["out_spans"] for r in read_output(out_dir).take_all()}
    return rows


def test_resume_after_injected_failure(ray_session, corpus_files, tmp_path):
    clean_dir = str(tmp_path / "clean")
    summary = run_resumable(corpus_files, clean_dir, _pipeline, run_id="clean",
                            files_per_partition=2)
    assert summary["processed"] == 3 and summary["skipped"] == 0

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(corpus_files, crash_dir, _pipeline, run_id="try1",
                      files_per_partition=2, fail_after=1)
    assert committed_partitions(crash_dir) == {0}

    resumed = run_resumable(corpus_files, crash_dir, _pipeline, run_id="try2",
                            files_per_partition=2)
    assert resumed["skipped"] == 1  # partition 0 not reprocessed
    assert resumed["processed"] == 2

    assert _collect(crash_dir) == _collect(clean_dir)

    lt = lineage_table(crash_dir).to_pylist()
    assert [r["partition_id"] for r in lt] == [0, 1, 2]
    assert all(r["status"] == "committed" for r in lt)
    assert {r["run_id"] for r in lt} == {"try1", "try2"}
    assert sum(r["doc_count"] for r in lt) == N_DOCS
    assert all(r["error_count"] == 0 for r in lt)
    assert sum(r["span_count"] for r in lt) > 0


def test_rerun_is_noop(ray_session, corpus_files, tmp_path):
    out = str(tmp_path / "noop")
    run_resumable(corpus_files, out, _pipeline, files_per_partition=3)
    again = run_resumable(corpus_files, out, _pipeline, files_per_partition=3)
    assert again["processed"] == 0 and again["skipped"] == 2
