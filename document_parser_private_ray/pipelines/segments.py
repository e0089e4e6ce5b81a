"""Segment-level corpus curation: boilerplate removal and exact
segment dedup (the CCNet / RefinedWeb line-level steps, expressed over
fixed word-window segments because this corpus is single-line text).

Both operators share ONE vectorized segmentation kernel: tokens come
straight from the Arrow string buffer (``utf8_split_whitespace``),
segment boundaries are computed as numpy offset arithmetic over the
list offsets, and segment text is materialized with a single
``pc.binary_join`` — no per-row Python in the explode.

Reference scope: the reference engine is single-document
(`/root/reference/main.py`); corpus-level curation has no counterpart
there and follows the published CCNet (Wenzek et al. 2019) and
deduplication (Lee et al. 2021) shapes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    from ..sources.readers import read_table

    return read_table(f"{sf_dir}/documents.parquet", list(columns))


def _as_array(col) -> pa.Array:
    """Plain (non-chunked) Arrow array for offsets/values access."""
    if isinstance(col, pa.ChunkedArray):
        return (
            col.chunk(0) if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
        )
    return col


def _segment_batch(batch: pa.Table, seg_words: int) -> pa.Table:
    """Explode a documents batch into (doc_id, pos, seg) rows — one row
    per non-overlapping ``seg_words``-token window, text rejoined with
    single spaces (whitespace-normalizing, so SQL replays byte-exactly).
    Empty documents contribute no rows (both engines agree)."""
    toks = _as_array(pc.utf8_split_whitespace(_as_array(batch["text"])))
    raw_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # drop empty tokens (split keeps ''-elements for empty/edge
    # whitespace; the SQL oracle's list_filter drops them)
    start, end = int(raw_off[0]), int(raw_off[-1])
    window_vals = toks.values.slice(start, end - start)
    keep_flat = (
        pc.utf8_length(window_vals).to_numpy(zero_copy_only=False) > 0
    )
    n_raw = np.diff(raw_off)
    docidx_flat = np.repeat(np.arange(len(n_raw)), n_raw)
    vals = window_vals.filter(pa.array(keep_flat))
    n_tok = np.bincount(docidx_flat[keep_flat], minlength=len(n_raw)).astype(
        np.int64
    )
    offsets = np.concatenate(([0], np.cumsum(n_tok)))
    m = (n_tok + seg_words - 1) // seg_words  # segments per doc
    total_m = int(m.sum())
    if total_m == 0:
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "seg": pa.array([], type=pa.string()),
            }
        )
    # intra-doc segment index 0..m_i-1, then global token start offsets
    intra = np.arange(total_m, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(m)[:-1])), m
    )
    seg_starts = np.repeat(offsets[:-1], m) + seg_words * intra
    # doc token ranges are contiguous, so segment boundaries are all
    # starts plus the final end — one offsets array for the list build
    seg_offsets = np.append(seg_starts, offsets[-1]).astype(np.int32)
    seg_list = pa.ListArray.from_arrays(
        pa.array(seg_offsets, type=pa.int32()), vals
    )
    seg_text = pc.binary_join(seg_list, " ")
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(np.repeat(doc_ids, m), type=pa.int64()),
            "pos": pa.array(intra, type=pa.int64()),
            "seg": seg_text,
        }
    )


def remove_boilerplate(sf_dir: str, seg_words: int = 4, min_df: int = 5):
    """Boilerplate removal, CCNet shape: segments appearing in >=
    ``min_df`` distinct documents are stripped from every document.
    Two corpus scans: (1) per-batch DISTINCT (seg, doc) partials ->
    ONE groupby(seg) document-frequency sum — the shuffle moves
    per-batch partial counts, never raw rows; the surviving boilerplate
    set (only ultra-frequent segments, bounded like a stop-shingle set)
    is collected and broadcast via ``ray.put``; (2) a second scan strips
    flagged segments with one ``pc.is_in`` per batch and rejoins the
    kept segments per document. Output: one row per non-empty document
    with exact removal counts and the cleaned text."""
    import ray
    from ray.data.aggregate import Sum

    docs = _read_docs(sf_dir)

    def df_partials(batch: pa.Table) -> pa.Table:
        segs = _segment_batch(batch, seg_words)
        # distinct (seg, doc) within the batch, then per-seg doc counts
        per_doc = segs.select(["seg", "doc_id"]).group_by(
            ["seg", "doc_id"]
        ).aggregate([])
        g = per_doc.group_by("seg").aggregate([("doc_id", "count")])
        return g.rename_columns(["seg", "df"])

    df = (
        docs.map_batches(df_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("seg")
        .aggregate(Sum("df", alias_name="df"))
    )
    boiler = df.map_batches(
        lambda b: b.filter(pc.greater_equal(b["df"], min_df)).select(["seg"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )  # ultra-frequent segments only: a small set by construction
    boiler_set = pa.concat_arrays(
        [
            _as_array(b["seg"]).cast(pa.string())
            for b in boiler.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        or [pa.array([], type=pa.string())]
    )
    boiler_ref = ray.put(boiler_set)

    def strip(batch: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)
        segs = _segment_batch(batch, seg_words)
        if segs.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_segs": pa.array([], type=pa.int64()),
                    "n_removed": pa.array([], type=pa.int64()),
                    "clean_text": pa.array([], type=pa.string()),
                }
            )
        is_boiler = (
            pc.is_in(segs["seg"], value_set=bset)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
            if len(bset)
            else np.zeros(segs.num_rows, dtype=bool)
        )
        doc_ids_seg = segs["doc_id"].to_numpy(zero_copy_only=False)
        uniq, doc_idx = np.unique(doc_ids_seg, return_inverse=True)
        n_segs = np.bincount(doc_idx, minlength=len(uniq)).astype(np.int64)
        n_removed = np.bincount(
            doc_idx[is_boiler], minlength=len(uniq)
        ).astype(np.int64)
        kept = segs.filter(pa.array(~is_boiler))
        kept_counts = np.bincount(
            doc_idx[~is_boiler], minlength=len(uniq)
        ).astype(np.int64)
        kept_offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(
            np.int32
        )
        seg_arr = _as_array(kept["seg"])
        clean = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(kept_offsets, type=pa.int32()), seg_arr),
            " ",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_segs": pa.array(n_segs, type=pa.int64()),
                "n_removed": pa.array(n_removed, type=pa.int64()),
                "clean_text": clean,
            }
        )

    return docs.map_batches(
        strip, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def dedup_segments(sf_dir: str, seg_words: int = 4):
    """Corpus-wide exact segment dedup (Lee et al. 2021 ExactSubstr at
    fixed-window granularity): only the FIRST occurrence of each
    segment — min (doc_id, pos) over the whole corpus — survives; later
    copies are dropped from their documents. The owner election is
    SALTED so no group is unbounded: groupby(seg, doc_id % 8) picks a
    per-salt candidate with a vectorized argmin (salts partition docs
    disjointly, so the global winner is always among the <= 8
    candidates), a TINY groupby(seg) over candidates only decides the
    election, and groupby(doc_id) reassembles the kept segments in
    position order."""

    docs = _read_docs(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        t = _segment_batch(batch, seg_words)
        # hot-key salt: a segment duplicated millions of times must not
        # land in ONE group; per-salt winners are correct candidates for
        # the global winner because salts partition (doc_id) disjointly
        salt = pc.cast(
            pc.bit_wise_and(t["doc_id"], pa.scalar(7, type=pa.int64())),
            pa.int64(),
        )
        return t.append_column("salt", salt)

    segs = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    OUT_COLS = ["doc_id", "pos", "seg", "keep", "cand"]

    def keep_first_salted(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        # lexicographic argmin over (doc_id, pos) without a sort
        cand_mask = d == d.min()
        winner = np.flatnonzero(cand_mask)[np.argmin(p[cand_mask])]
        keep = np.zeros(len(d), dtype=bool)
        cand = np.zeros(len(d), dtype=bool)
        cand[winner] = True  # this salt's candidate; election pending
        return (
            group.drop_columns(["salt"])
            .append_column("keep", pa.array(keep))
            .append_column("cand", pa.array(cand))
            .select(OUT_COLS)
        )

    per_salt = segs.groupby(["seg", "salt"]).map_groups(
        keep_first_salted, batch_format="pyarrow", zero_copy_batch=True
    )
    losers = per_salt.map_batches(
        lambda b: b.filter(pc.invert(b["cand"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cands = per_salt.map_batches(
        lambda b: b.filter(b["cand"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def elect(group: pa.Table) -> pa.Table:
        # <= 8 candidate rows per segment: pick the global first
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        cand_mask = d == d.min()
        winner = np.flatnonzero(cand_mask)[np.argmin(p[cand_mask])]
        keep = np.zeros(len(d), dtype=bool)
        keep[winner] = True
        return group.drop_columns(["keep"]).append_column(
            "keep", pa.array(keep)
        ).select(OUT_COLS)

    flagged = losers.union(
        cands.groupby("seg").map_groups(
            elect, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def reassemble(group: pa.Table) -> pa.Table:
        p = group["pos"].to_numpy(zero_copy_only=False)
        order = np.argsort(p, kind="stable")
        keep = group["keep"].to_numpy(zero_copy_only=False).astype(bool)[order]
        seg_arr = _as_array(group["seg"].take(pa.array(order[keep])))
        clean = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(seg_arr)], type=pa.int32()), seg_arr
            ),
            " ",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [int(group["doc_id"][0].as_py())], type=pa.int64()
                ),
                "n_segs": pa.array([len(p)], type=pa.int64()),
                "n_kept": pa.array([int(keep.sum())], type=pa.int64()),
                "clean_text": clean,
            }
        )

    return (
        flagged.groupby("doc_id")
        .map_groups(reassemble, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )
