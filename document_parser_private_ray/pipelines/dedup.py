"""Deduplication operators over a documents table (doc_id, text) — the
training-data-pipeline family: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes:
  * exact: vectorized content hash -> groupby(hash) -> keep min doc_id
    (hash-partitioned shuffle moves only (hash, doc_id) pairs after a
    projection, never the text);
  * MinHash-LSH: per-batch signatures (actor pool holds the permutation
    matrix) -> explode to (band, key, doc_id) rows -> groupby bands ->
    candidate pairs -> Jaccard verify -> min-label dedup. The only
    all-to-all moves the tiny band-key table;
  * SimHash: 64-bit signature per doc; bucket by the 4x16-bit bands
    (Hamming<=3 within-band collision guarantee via pigeonhole) ->
    verify Hamming distance;
  * embedding cosine: normalized vectors, candidate buckets via sign-LSH
    or brute-force per-batch matmul against a broadcast matrix (small
    collections) — both paths return identical pairs on the testdata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import MinHasher, hamming64, jaccard, shingles, simhash64


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    from ..sources.readers import read_table

    return read_table(f"{sf_dir}/documents.parquet", columns)


# -- exact dedup ---------------------------------------------------------

def add_content_hash(batch: pa.Table) -> pa.Table:
    import hashlib

    h = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def dedup_exact(sf_dir: str, n_buckets: int = 64):
    """Survivors of exact-text dedup: keep the min doc_id per distinct
    text. Projection to (hash, doc_id) BEFORE the shuffle; the reduce is
    co-partitioned by a hash bucket and closed with ONE vectorized
    Arrow group_by per bucket — Ray-native aggregates pay per-distinct-
    group overhead, and this reduce has one group per unique document
    (unbounded at corpus scale)."""
    ds = _read_docs(sf_dir)
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["content_hash", "doc_id"]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        # first hex digit pairs of the sha256 give a uniform bucket
        b = [int(h[:2], 16) % n_buckets for h in t["content_hash"].to_pylist()]
        return t.append_column("b", pa.array(b, type=pa.int32()))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        g = (
            group.select(["content_hash", "doc_id"])
            .group_by("content_hash")
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
        )
        g = g.rename_columns(["content_hash", "keep_doc_id", "n_copies"])
        return g.select(["content_hash", "keep_doc_id", "n_copies"])

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(reduce_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .sort("keep_doc_id")
    )


# -- MinHash-LSH near-dup ------------------------------------------------

class MinHashSignatures:
    """Actor stage: text -> (doc_id, band, key) rows. The permutation
    coefficients live once per actor."""

    def __init__(self, n_perm: int = 128, n_bands: int = 16, k_shingle: int = 3):
        self.hasher = MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, keys = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.hasher.signature(shingles(text, self.k))
            for band, key in enumerate(self.hasher.band_keys(sig, self.n_bands)):
                doc_ids.append(doc_id)
                bands.append(band)
                keys.append(key)
        return pa.Table.from_arrays(
            [
                pa.array(doc_ids),
                pa.array(bands, type=pa.int32()),
                pa.array(keys, type=pa.uint64()),
            ],
            names=["doc_id", "band", "key"],
        )


def minhash_candidate_pairs(
    sf_dir: str, n_perm: int = 128, n_bands: int = 16, max_bucket: int = 4096
):
    """(doc_a, doc_b) candidate pairs from shared LSH buckets."""
    ds = _read_docs(sf_dir)
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"n_perm": n_perm, "n_bands": n_bands},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512,
        concurrency=(1, 4),
    )

    # hash-bucket the (band, key) space: every LSH bucket lands whole in
    # one group, but pair generation runs as a few VECTORIZED Arrow
    # self-joins per hash class instead of a Python map_groups call per
    # bucket (tens of thousands of tiny buckets made that path
    # group-call-bound — same fix as ngram_jaccard's inverted index)
    n_hash_classes = 64

    def add_class(t: pa.Table) -> pa.Table:
        import numpy as np

        k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cls = ((k * np.uint64(0x9E3779B97F4A7C15) + b) % n_hash_classes).astype("int32")
        return t.append_column("cls", pa.array(cls))

    def class_pairs(group: pa.Table) -> pa.Table:
        import logging

        g = group.select(["band", "key", "doc_id"]).combine_chunks()
        g = pa.Table.from_arrays(
            [g["band"], g["key"], pc.cast(g["doc_id"], pa.int64())],
            names=["band", "key", "doc_id"],
        )
        stats = g.group_by(["band", "key"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        )
        g = g.join(stats, keys=["band", "key"], join_type="inner")
        empty = pa.Table.from_pydict(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
            }
        )
        parts = []
        over = pc.greater(g["doc_id_count"], max_bucket)
        heavy = g.filter(over)
        if heavy.num_rows > 0:
            logging.getLogger(__name__).warning(
                "LSH buckets over cap %d (largest %d members): emitting star pairs",
                max_bucket, pc.max(heavy["doc_id_count"]).as_py(),
            )
            # star over the bucket's min id: (min, x) for every x != min
            star = heavy.filter(pc.not_equal(heavy["doc_id"], heavy["doc_id_min"]))
            parts.append(
                pa.Table.from_arrays(
                    [star["doc_id_min"], star["doc_id"]], names=["doc_a", "doc_b"]
                )
            )
        normal = g.filter(pc.invert(over)).select(["band", "key", "doc_id"])
        if normal.num_rows > 0:
            left = normal.rename_columns(["band", "key", "doc_a"])
            right = normal.rename_columns(["band", "key", "doc_b"])
            joined = left.join(right, keys=["band", "key"], join_type="inner")
            parts.append(
                joined.filter(pc.less(joined["doc_a"], joined["doc_b"])).select(
                    ["doc_a", "doc_b"]
                )
            )
        if not parts:
            return empty
        out = pa.concat_tables(parts)
        # local distinct before the shuffle (a pair may repeat across
        # bands within the class): fewer rows move
        return out.group_by(["doc_a", "doc_b"]).aggregate([])

    pairs = (
        sigs.map_batches(add_class, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cls")
        .map_groups(class_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    # distinct pairs (same pair can collide in several hash classes)
    return _dedupe_pairs_bucketed(
        pairs, [([], "count_all")], ["doc_a", "doc_b", "count()"]
    )


def _dedupe_pairs_bucketed(pairs, aggs, out_names, n_classes: int = 64):
    """Global per-(doc_a, doc_b) aggregate via hash-bucket co-partition
    + ONE vectorized pa group_by per bucket. Pair keys are corpus-scale
    and repeat across LSH hash classes, where a native
    groupby(doc_a, doc_b).aggregate pays the per-distinct-key
    cross-block merge cost (the cosupplier lesson). Same single
    exchange, no per-key cost."""
    import numpy as np

    G = np.uint64(0x9E3779B97F4A7C15)

    def add_pcls(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (((a * G + b) * G) >> np.uint64(58)).astype("int32")
        return t.append_column("__pcls", pa.array(p))

    def agg_bucket(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["__pcls"])
            .group_by(["doc_a", "doc_b"])
            .aggregate(aggs)
        )
        return g.rename_columns(out_names)

    return (
        pairs.map_batches(add_pcls, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pcls")
        .map_groups(agg_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def attach_pair_texts(pairs, docs, n_buckets: int = 32, n_pairs=None,
                      broadcast_max_pairs: int = 100_000):
    """Text co-location for a candidate-pair table: returns a Dataset
    (doc_a, doc_b, text_a, text_b). Two execution shapes, chosen by
    candidate-set size — the broadcast-vs-shuffle join decision:

    * **broadcast path** (``n_pairs`` known and <= ``broadcast_max_pairs``):
      the pair list is already driver-resident (it IS the query result);
      its id set is ``ray.put`` once, one full scan of ``docs`` filters
      candidate rows with NO corpus shuffle, and the tiny (id -> text)
      map broadcasts back into a stateless map over the pairs. The
      driver holds only ids + candidate texts, both O(n_pairs) and
      hard-bounded by the threshold.
    * **shuffle path** (large/unknown candidate sets): pair sides
      explode to key-tagged rows, union with the projected docs table,
      ONE groupby(key) attaches each doc's text to every side-row in
      its bucket, then ONE groupby(doc_a, doc_b) reassembles
      (text_a, text_b) — two co-partition shuffles total, no driver
      materialization, no per-pair text duplication beyond the two
      sides every join must ship.
    """
    if n_pairs is not None and n_pairs <= broadcast_max_pairs:
        return _attach_pair_texts_broadcast(pairs, docs)
    return _attach_pair_texts_shuffle(pairs, docs)


def _attach_pair_texts_broadcast(pairs, docs):
    import ray

    pair_tbl = pa.concat_tables(
        [b for b in pairs.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_format="pyarrow", batch_size=None)]
    )
    a = pc.cast(pair_tbl["doc_a"], pa.int64())
    b = pc.cast(pair_tbl["doc_b"], pa.int64())
    id_set = set(a.to_pylist()) | set(b.to_pylist())
    ids_ref = ray.put(pa.array(sorted(id_set), type=pa.int64()))

    class FilterCandidates:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(pc.cast(batch["doc_id"], pa.int64()), value_set=self.ids)
            return batch.filter(mask)

    cand = pa.concat_tables(
        [t for t in docs.map_batches(
            FilterCandidates, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=(1, 4),
        ).iter_batches(batch_format="pyarrow", batch_size=None)]
    )
    import ray.data as rd

    texts = dict(
        zip(pc.cast(cand["doc_id"], pa.int64()).to_pylist(), cand["text"].to_pylist())
    )
    # drop pairs referencing ids absent from the docs table — the
    # shuffle path's inner-join does the same, so both size-gated paths
    # agree on missing-id semantics (ADVICE r2)
    a_list, b_list = a.to_pylist(), b.to_pylist()
    kept = [
        (x, y) for x, y in zip(a_list, b_list) if x in texts and y in texts
    ]
    return rd.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_a": pa.array([x for x, _ in kept], type=pa.int64()),
                "doc_b": pa.array([y for _, y in kept], type=pa.int64()),
                "text_a": pa.array([texts[x] for x, _ in kept]),
                "text_b": pa.array([texts[y] for _, y in kept]),
            }
        )
    )


def _attach_pair_texts_shuffle(pairs, docs, n_buckets: int = 64):
    """Scale path: candidate pairs are corpus-scale, so both attach
    stages are hash-bucket co-partitions with ONE vectorized kernel per
    bucket (r5 — previously the key stage paid one interpreter call per
    candidate doc and the reassembly one per candidate PAIR):

      1. key stage: side rows + bloom-pruned doc rows bucket by doc_id;
         inside a bucket an argsort + searchsorted maps every side row
         to its text (an Arrow take, no per-row Python);
      2. pair stage: attached side rows bucket by pair hash; the a-side
         and b-side align via np.unique on the structured (doc_a,
         doc_b) key, emitting (text_a, text_b) rows.
    """
    import numpy as np
    import ray

    from .bloom import bloom_mask, build_bloom

    # Bloom-prune the docs side BEFORE the co-partition exchange: the
    # candidate-pair id set is tiny next to the corpus, so most doc
    # texts can never match a pair and must not enter the shuffle.
    # False positives ship harmlessly (the in-group inner match drops
    # them); false negatives are impossible.
    pairs = pairs.materialize()  # consumed twice: bloom build + sides

    def pair_keys(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64()).combine_chunks()
        b = pc.cast(t["doc_b"], pa.int64()).combine_chunks()
        return pa.Table.from_pydict({"key": pa.concat_arrays([a, b])})

    bloom_ref = ray.put(
        build_bloom(
            pairs.map_batches(
                pair_keys, batch_format="pyarrow", zero_copy_batch=True
            ),
            "key",
        )
    )

    def explode_sides(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64()).combine_chunks()
        b = pc.cast(t["doc_b"], pa.int64()).combine_chunks()
        n = len(a)
        key = pa.concat_arrays([a, b])
        kb = (key.to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return pa.Table.from_pydict(
            {
                "key": key,
                "doc_a": pa.concat_arrays([a, a]),
                "doc_b": pa.concat_arrays([b, b]),
                "role": pa.array(["a"] * n + ["b"] * n),
                "text": pa.nulls(2 * n, type=pa.string()),
                "kb": pa.array(kb),
            }
        )

    def docs_as_rows(t: pa.Table) -> pa.Table:
        keep = bloom_mask(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False),
            ray.get(bloom_ref),
        )
        t = t.filter(pa.array(keep))
        n = len(t)
        key = pc.cast(t["doc_id"], pa.int64())
        kb = (key.to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return pa.Table.from_pydict(
            {
                "key": key,
                "doc_a": pa.nulls(n, type=pa.int64()),
                "doc_b": pa.nulls(n, type=pa.int64()),
                "role": pa.array(["d"] * n),
                "text": t["text"],
                "kb": pa.array(kb),
            }
        )

    sides = pairs.map_batches(explode_sides, batch_format="pyarrow", zero_copy_batch=True)
    drows = docs.map_batches(docs_as_rows, batch_format="pyarrow", zero_copy_batch=True)

    def attach_bucket(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        is_doc = pc.equal(g["role"], "d")
        doc_rows = g.filter(is_doc)
        side_rows = g.filter(pc.invert(is_doc))
        if doc_rows.num_rows == 0 or side_rows.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "role": pa.array([], type=pa.string()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        dk = doc_rows["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(dk)
        dk_s = dk[order]
        texts_sorted = doc_rows["text"].combine_chunks().take(pa.array(order))
        sk = side_rows["key"].to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(dk_s, sk), len(dk_s) - 1)
        ok = dk_s[idx] == sk
        kept = side_rows.filter(pa.array(ok))
        return pa.Table.from_pydict(
            {
                "doc_a": kept["doc_a"],
                "doc_b": kept["doc_b"],
                "role": kept["role"],
                "text": texts_sorted.take(pa.array(idx[ok])),
            }
        )

    attached = (
        sides.union(drows)
        .groupby("kb")
        .map_groups(attach_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = (
            ((a * np.uint64(0x9E3779B97F4A7C15) + b) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(58)
        ).astype("int32")
        return t.append_column("pb", pa.array(pb))

    def reassemble_bucket(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        is_a = pc.equal(g["role"], "a")
        ta = g.filter(is_a)
        tb = g.filter(pc.invert(is_a))
        if ta.num_rows == 0 or tb.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "text_a": pa.array([], type=pa.string()),
                    "text_b": pa.array([], type=pa.string()),
                }
            )

        def codes(t):
            arr = np.empty(t.num_rows, dtype=[("a", np.int64), ("b", np.int64)])
            arr["a"] = t["doc_a"].to_numpy(zero_copy_only=False)
            arr["b"] = t["doc_b"].to_numpy(zero_copy_only=False)
            return arr

        ca, cb = codes(ta), codes(tb)
        uniq, inv = np.unique(np.concatenate([ca, cb]), return_inverse=True)
        inv_a, inv_b = inv[: len(ca)], inv[len(ca):]
        pos_b = np.full(len(uniq), -1, dtype=np.int64)
        pos_b[inv_b] = np.arange(len(cb))
        match = pos_b[inv_a]
        sel = match >= 0
        kept_a = ta.filter(pa.array(sel))
        return pa.Table.from_pydict(
            {
                "doc_a": kept_a["doc_a"],
                "doc_b": kept_a["doc_b"],
                "text_a": kept_a["text"],
                "text_b": tb["text"].combine_chunks().take(pa.array(match[sel])),
            }
        )

    return (
        attached.map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(reassemble_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )


def minhash_verified_pairs(
    sf_dir: str, threshold: float = 0.8, n_perm: int = 128, n_bands: int = 16,
    pair_filter=None,
):
    """Shared front half of the MinHash near-dup family: LSH candidate
    pairs -> exact Jaccard verify. Returns (verified_pairs_dataset,
    n_candidates, n_verified); the dataset is None when no candidates
    survive either stage. Candidate texts co-locate with their pairs
    via ``attach_pair_texts`` (size-gated: broadcast id-filter for
    small candidate sets, two co-partition groupbys at scale — never an
    unbounded driver text fetch or a broadcast shingle map), and the
    Jaccard verify runs per batch with a batch-local shingle memo.

    ``pair_filter`` (optional): a per-batch pa.Table -> pa.Table
    predicate applied to the candidate pairs BEFORE text attach +
    verify — e.g. keep only cross-side (incoming x state) pairs so the
    expensive verify never touches pairs the caller will discard."""
    pairs_ds = minhash_candidate_pairs(sf_dir, n_perm, n_bands)
    if pair_filter is not None:
        pairs_ds = pairs_ds.map_batches(
            pair_filter, batch_format="pyarrow", zero_copy_batch=True
        )
    pairs_ds = pairs_ds.materialize()
    n_candidates = pairs_ds.count()
    if n_candidates == 0:
        return None, 0, 0

    with_texts = attach_pair_texts(pairs_ds, _read_docs(sf_dir), n_pairs=n_candidates)

    def verify(batch: pa.Table) -> pa.Table:
        memo = {}

        def sh(doc, text):
            s = memo.get(doc)
            if s is None:
                s = shingles(text, 3)
                memo[doc] = s
            return s

        keep_a, keep_b = [], []
        for a, b, ta, tb in zip(
            batch["doc_a"].to_pylist(),
            batch["doc_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            if jaccard(sh(a, ta), sh(b, tb)) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(keep_a, type=pa.int64()),
                "doc_b": pa.array(keep_b, type=pa.int64()),
            }
        )

    verified = with_texts.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048
    ).materialize()
    n_verified = verified.count()
    if n_verified == 0:
        return None, n_candidates, 0
    return verified, n_candidates, n_verified


def dedup_minhash(sf_dir: str, threshold: float = 0.8, n_perm: int = 128, n_bands: int = 16):
    """Near-dup clusters: LSH candidates -> exact Jaccard verify ->
    survivor = min doc_id per connected component
    (``minhash_verified_pairs`` for the shared front half). Survivor
    labels come from the join-based ``connected_components``; the
    driver holds only the final counts and the drop list (which IS the
    query's result)."""
    verified, n_candidates, n_verified = minhash_verified_pairs(
        sf_dir, threshold, n_perm, n_bands
    )
    if verified is None:
        return {
            "n_candidate_pairs": n_candidates,
            "n_verified_pairs": n_verified,
            "dropped_doc_ids": [],
        }

    from .components import component_drops

    drops = component_drops(verified, n_verified)
    return {
        "n_candidate_pairs": n_candidates,
        "n_verified_pairs": n_verified,
        "dropped_doc_ids": drops,
    }


def neardup_keep_best(
    sf_dir: str,
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 16,
    n_buckets: int = 64,
    broadcast_max_nodes: int = 100_000,
):
    """Quality-canonical near-dup resolution: one row per MinHash
    near-dup cluster with the keeper chosen by CONTENT QUALITY (max
    text bytes, tie -> min doc_id) instead of min doc_id — the curation
    policy that keeps the longest/most complete copy of a duplicated
    page rather than whichever crawled first. Returns
    (cluster, keep_doc_id, keep_bytes, n_members) sorted by cluster.

    Scale shape (the attach_pair_texts broadcast-vs-shuffle decision,
    gated on the LABELLED-NODE count — bounded by verified near-dup
    pairs, never the corpus):

    * **broadcast path** (<= ``broadcast_max_nodes`` labelled nodes):
      the (node -> label) map is already driver-sized (it IS part of
      the result); its id set broadcasts via ``ray.put`` and ONE
      shuffle-free docs scan returns just the members' byte lengths,
      then a single driver-side lexsort elects every keeper. Zero
      exchanges beyond connected_components itself (bench: this took
      the query from 20.8 s to the dedup_minhash ballpark — the join
      path was paying 3 exchanges to process a few hundred rows).
    * **shuffle path** (larger label sets): ONE co-partition join
      attaches byte lengths, then the dedup_exact bucket idiom —
      hash-bucket the label space, one vectorized lexsort +
      first-of-run per bucket, zero per-cluster Python calls."""
    import numpy as np

    from .components import connected_components
    from .joins import bucketed_join

    verified, _, _ = minhash_verified_pairs(sf_dir, threshold, n_perm, n_bands)
    empty = pa.Table.from_pydict(
        {
            "cluster": pa.array([], type=pa.int64()),
            "keep_doc_id": pa.array([], type=pa.int64()),
            "keep_bytes": pa.array([], type=pa.int64()),
            "n_members": pa.array([], type=pa.int64()),
        }
    )
    if verified is None:
        import ray.data as rd

        return rd.from_arrow(empty)

    labels = connected_components(verified).materialize()
    n_nodes = labels.count()

    def doc_bytes(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(batch["text"]), pa.int64()),
            }
        )

    if n_nodes <= broadcast_max_nodes:
        import ray
        import ray.data as rd

        lab_tbl = pa.concat_tables(
            labels.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        node_arr = lab_tbl["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab_arr = lab_tbl["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_ref = ray.put(pa.array(node_arr, type=pa.int64()))

        def member_bytes(batch: pa.Table) -> pa.Table:
            t = doc_bytes(batch)
            return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(ids_ref)))

        mem = pa.concat_tables(
            _read_docs(sf_dir)
            .map_batches(member_bytes, batch_format="pyarrow", zero_copy_batch=True)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )  # <= n_nodes rows by construction
        mids = mem["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mbytes = mem["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        sorter = np.argsort(mids)
        mids_s = mids[sorter]
        idx = np.searchsorted(mids_s, node_arr)
        ok = (idx < len(mids_s)) & (mids_s[np.minimum(idx, len(mids_s) - 1)] == node_arr)
        if not ok.all():
            raise ValueError("labelled node missing from documents table")
        nb = mbytes[sorter][idx]
        order = np.lexsort((node_arr, -nb, lab_arr))
        lab_s, node_s, nb_s = lab_arr[order], node_arr[order], nb[order]
        first = np.ones(len(lab_s), dtype=bool)
        first[1:] = lab_s[1:] != lab_s[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(lab_s)))
        return rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "cluster": pa.array(lab_s[starts], type=pa.int64()),
                    "keep_doc_id": pa.array(node_s[starts], type=pa.int64()),
                    "keep_bytes": pa.array(nb_s[starts], type=pa.int64()),
                    "n_members": pa.array(sizes.astype(np.int64)),
                }
            )
        )

    lens = _read_docs(sf_dir).map_batches(
        doc_bytes, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucketed_join(labels, lens, "node", "doc_id", n_buckets=16)

    def add_bucket(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "b", pa.array((lab % n_buckets).astype(np.int32))
        )

    def elect_bucket(group: pa.Table) -> pa.Table:
        lab = group["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = group["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = group["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        # keeper = first of each label run under (label asc, bytes desc,
        # doc asc) — lexsort keys are last-significant-first
        order = np.lexsort((node, -nb, lab))
        lab_s, node_s, nb_s = lab[order], node[order], nb[order]
        first = np.ones(len(lab_s), dtype=bool)
        first[1:] = lab_s[1:] != lab_s[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(lab_s)))
        return pa.Table.from_pydict(
            {
                "cluster": pa.array(lab_s[starts], type=pa.int64()),
                "keep_doc_id": pa.array(node_s[starts], type=pa.int64()),
                "keep_bytes": pa.array(nb_s[starts], type=pa.int64()),
                "n_members": pa.array(sizes.astype(np.int64)),
            }
        )

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(elect_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .sort("cluster")
    )


# -- SimHash near-dup ----------------------------------------------------

def simhash_table(sf_dir: str):
    """(doc_id, simhash, band0..band3) — 16-bit bands for Hamming<=3
    bucketing (pigeonhole: <=3 differing bits leave >=1 band intact)."""
    ds = _read_docs(sf_dir)

    def sig(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch["text"].to_pylist()]
        cols = [batch["doc_id"], pa.array(hs, type=pa.uint64())]
        names = ["doc_id", "simhash"]
        for b in range(4):
            cols.append(pa.array([(h >> (16 * b)) & 0xFFFF for h in hs], type=pa.int32()))
            names.append(f"band{b}")
        return pa.Table.from_arrays(cols, names=names)

    return ds.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)


def dedup_simhash(sf_dir: str, max_hamming: int = 3, max_bucket: int = 4096):
    """Near-dup pairs by SimHash banding + Hamming verify — fully
    distributed: signatures explode to (band, value, doc_id, simhash)
    rows, buckets hash into classes, and each class generates its pairs
    with one vectorized Arrow self-join plus a numpy popcount Hamming
    verify (no Python call per bucket); a final groupby dedupes pairs
    that collide in several bands. Only the tiny banded table shuffles.
    A bucket over ``max_bucket`` members verifies only the star over its
    min id (O(n) instead of the O(n²) straggler bomb; cluster
    connectivity preserved, redundant intra-clique pairs dropped —
    logged)."""
    sigs = simhash_table(sf_dir)

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sims = batch["simhash"].to_pylist()
        rows = {"band": [], "value": [], "doc_id": [], "simhash": []}
        for doc_id, h in zip(doc_ids, sims):
            for b in range(4):
                rows["band"].append(b)
                rows["value"].append((h >> (16 * b)) & 0xFFFF)
                rows["doc_id"].append(doc_id)
                rows["simhash"].append(h)
        return pa.Table.from_pydict(
            {
                "band": pa.array(rows["band"], type=pa.int32()),
                "value": pa.array(rows["value"], type=pa.int32()),
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "simhash": pa.array(rows["simhash"], type=pa.uint64()),
            }
        )

    # same vectorized treatment as minhash_candidate_pairs: hash the
    # (band, value) bucket space into classes, one Arrow self-join per
    # class, star construction for oversize buckets, Hamming verify as
    # a numpy popcount over xor-ed signatures (16-bit table lookups).
    n_hash_classes = 64

    _POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        return (
            _POP16[(x & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)]
        ).astype(np.int64)

    def add_class(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cls = ((v * np.uint64(0x9E3779B97F4A7C15) + b) % n_hash_classes).astype("int32")
        return t.append_column("cls", pa.array(cls))

    def class_pairs(group: pa.Table) -> pa.Table:
        import logging

        g = group.select(["band", "value", "doc_id", "simhash"]).combine_chunks()
        stats = g.group_by(["band", "value"]).aggregate(
            [("doc_id", "count"), ("doc_id", "min")]
        )
        g = g.join(stats, keys=["band", "value"], join_type="inner")
        parts = []
        over = pc.greater(g["doc_id_count"], max_bucket)
        heavy = g.filter(over)
        if heavy.num_rows > 0:
            logging.getLogger(__name__).warning(
                "simhash buckets over cap %d (largest %d members): star verify",
                max_bucket, pc.max(heavy["doc_id_count"]).as_py(),
            )
            # star over each bucket's min id; fetch the root's simhash by
            # joining the roots back on (band, value)
            roots = (
                heavy.group_by(["band", "value"])
                .aggregate([("doc_id_min", "min")])
                .rename_columns(["band", "value", "root_id"])
            )
            root_sigs = g.join(
                roots, keys=["band", "value"], join_type="inner"
            )
            root_rows = root_sigs.filter(
                pc.equal(root_sigs["doc_id"], root_sigs["root_id"])
            ).select(["band", "value", "doc_id", "simhash"]).rename_columns(
                ["band", "value", "root_id", "root_sim"]
            )
            others = heavy.select(["band", "value", "doc_id", "simhash"]).join(
                root_rows, keys=["band", "value"], join_type="inner"
            )
            others = others.filter(pc.not_equal(others["doc_id"], others["root_id"]))
            parts.append(
                pa.Table.from_arrays(
                    [others["root_id"], others["doc_id"], others["root_sim"], others["simhash"]],
                    names=["doc_a", "doc_b", "sim_a", "sim_b"],
                )
            )
        normal = g.filter(pc.invert(over)).select(["band", "value", "doc_id", "simhash"])
        if normal.num_rows > 0:
            left = normal.rename_columns(["band", "value", "doc_a", "sim_a"])
            right = normal.rename_columns(["band", "value", "doc_b", "sim_b"])
            joined = left.join(right, keys=["band", "value"], join_type="inner")
            parts.append(
                joined.filter(pc.less(joined["doc_a"], joined["doc_b"])).select(
                    ["doc_a", "doc_b", "sim_a", "sim_b"]
                )
            )
        if not parts:
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        cand = pa.concat_tables(parts)
        ham = _popcount64(
            np.bitwise_xor(
                cand["sim_a"].to_numpy(zero_copy_only=False).astype(np.uint64),
                cand["sim_b"].to_numpy(zero_copy_only=False).astype(np.uint64),
            )
        )
        cand = pa.Table.from_arrays(
            [
                pc.cast(cand["doc_a"], pa.int64()),
                pc.cast(cand["doc_b"], pa.int64()),
                pa.array(ham, type=pa.int64()),
            ],
            names=["doc_a", "doc_b", "hamming"],
        )
        cand = cand.filter(pc.less_equal(cand["hamming"], max_hamming))
        # local distinct (a pair may collide in several bands in-class)
        return cand.group_by(["doc_a", "doc_b"]).aggregate([("hamming", "min")]).rename_columns(
            ["doc_a", "doc_b", "hamming"]
        )

    from ray.data.aggregate import Min

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_class, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cls")
        .map_groups(class_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    # a pair can collide in several hash classes -> global dedupe
    return _dedupe_pairs_bucketed(
        pairs, [("hamming", "min")], ["doc_a", "doc_b", "hamming"]
    ).sort(["doc_a", "doc_b"])


# -- n-gram Jaccard (exact, fully distributed) ---------------------------

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, k: int = 3, max_df: int = 100_000):
    """All pairs with shingle-Jaccard >= threshold — EXACT, with the
    inverted-index shuffle shape (no take_all, no broadcast corpus map):

      1. ONE shingling pass -> exploded (shingle, doc_id, n_sh) rows
         (each posting carries its document's set size, so no separate
         size table and no size joins);
      2. postings hash-bucket by shingle (all postings of a shingle land
         in one bucket, so document frequency stays globally exact) and
         each bucket runs a VECTORIZED Arrow self-join: per-pair partial
         intersection counts plus both set sizes, stop-shingles with
         df > ``max_df`` dropped (logged);
      3. one global groupby(doc_a, doc_b) sums the partials;
         jaccard = i / (|A| + |B| - i), filter >= threshold.

    A pair of two EMPTY-shingle documents has jaccard 1.0 by
    definition; empty docs never reach the inverted index, so they are
    detected with a vectorized no-words check and emitted as the STAR
    over the min empty doc_id — (root, x, 1.0) per other empty doc.
    All-pairs among empty docs is informationally redundant (they form
    ONE duplicate group) and O(n²): a web crawl has millions of
    whitespace-only docs, so the star keeps the output O(n), preserves
    group connectivity for clustering, and stays fully streaming (the
    driver holds only the root id)."""
    def explode(batch: pa.Table) -> pa.Table:
        # the vectorized char-stream shingle kernel (setjoin r5):
        # identical distinct (shingle, doc, set-size) postings, no
        # per-doc Python loop
        from .setjoin import _explode_shingles

        t = _explode_shingles(batch, k)
        return t.rename_columns(["sh", "doc_id", "n_sh"])

    postings = _read_docs(sf_dir).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024
    )

    # one bucket per hash class of shingles: ALL postings of a shingle
    # land in one group (bucket = sh % n), so document frequency and the
    # per-shingle pair sets stay globally correct — but pair generation
    # runs as ONE vectorized Arrow self-join per bucket instead of a
    # Python map_groups call per shingle (tens of thousands of tiny
    # groups made that path group-call-bound)
    n_sh_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        b = (t["sh"].to_numpy(zero_copy_only=False) % n_sh_buckets).astype("int32")
        return t.append_column("bucket", pa.array(b))

    def bucket_self_join(group: pa.Table) -> pa.Table:
        import logging

        g = group.select(["sh", "doc_id", "n_sh"]).combine_chunks()
        # global df per shingle (complete posting lists are in-group)
        df = pc.value_counts(g["sh"])
        heavy = df.filter(pc.greater(pc.struct_field(df, "counts"), max_df))
        if len(heavy) > 0:
            logging.getLogger(__name__).warning(
                "%d stop-shingles with df > %d dropped", len(heavy), max_df
            )
            keep = pc.invert(
                pc.is_in(g["sh"], value_set=pc.struct_field(heavy, "values"))
            )
            g = g.filter(keep)
        empty = pa.Table.from_pydict(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_inter": pa.array([], type=pa.int64()),
                "n_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        left = pa.Table.from_arrays(
            [g["sh"], g["doc_id"], g["n_sh"]], names=["sh", "doc_a", "n_a"]
        )
        right = pa.Table.from_arrays(
            [g["sh"], g["doc_id"], g["n_sh"]], names=["sh", "doc_b", "n_b"]
        )
        joined = left.join(right, keys=["sh"], join_type="inner")
        # length filter (r5): J <= min/max, so min < t*max can never
        # reach the threshold — applied identically in every bucket,
        # the pair vanishes everywhere, exactly as if post-filtered
        pairs = joined.filter(
            pc.and_(
                pc.less(joined["doc_a"], joined["doc_b"]),
                pc.greater_equal(
                    pc.cast(
                        pc.min_element_wise(joined["n_a"], joined["n_b"]),
                        pa.float64(),
                    ),
                    pc.multiply(
                        pa.scalar(threshold, type=pa.float64()),
                        pc.cast(
                            pc.max_element_wise(joined["n_a"], joined["n_b"]),
                            pa.float64(),
                        ),
                    ),
                ),
            )
        )
        if pairs.num_rows == 0:
            return empty
        # partial |A ∩ B| per pair within the bucket (combined globally
        # by the downstream groupby); sizes ride along (equal per doc)
        agg = pairs.group_by(["doc_a", "doc_b"]).aggregate(
            [("sh", "count"), ("n_a", "max"), ("n_b", "max")]
        )
        return pa.Table.from_arrays(
            [
                agg["doc_a"],
                agg["doc_b"],
                pc.cast(agg["sh_count"], pa.int64()),
                agg["n_a_max"],
                agg["n_b_max"],
            ],
            names=["doc_a", "doc_b", "n_inter", "n_a", "n_b"],
        )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pb = (
            ((a * np.uint64(0x9E3779B97F4A7C15) + b) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(58)
        ).astype("int32")
        return t.append_column("pb", pa.array(pb))

    def sum_pairs_bucket(group: pa.Table) -> pa.Table:
        # pair keys are corpus-scale and repeat across shingle buckets:
        # co-partition by pair hash + ONE vectorized group_by per bucket
        # instead of groupby(doc_a, doc_b).aggregate's per-key
        # cross-block merge (r5 — the cosupplier idiom)
        g = (
            group.select(["doc_a", "doc_b", "n_inter", "n_a", "n_b"])
            .group_by(["doc_a", "doc_b"])
            .aggregate([("n_inter", "sum"), ("n_a", "max"), ("n_b", "max")])
        )
        return g.rename_columns(["doc_a", "doc_b", "n_inter", "n_a", "n_b"])

    inter = (
        postings.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_self_join, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_pair_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(sum_pairs_bucket, batch_format="pyarrow", zero_copy_batch=True)
    )

    def score(t: pa.Table) -> pa.Table:
        union = pc.subtract(pc.add(t["n_a"], t["n_b"]), t["n_inter"])
        j = pc.divide(
            pc.cast(t["n_inter"], pa.float64()), pc.cast(union, pa.float64())
        )
        out = pa.Table.from_pydict(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "jaccard_sim": j}
        )
        return out.filter(pc.greater_equal(j, threshold))

    scored = inter.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    # empty-shingle docs: jaccard(∅, ∅) = 1.0 by definition — detect
    # with a vectorized no-words check (a doc shingles to ∅ iff it has
    # no whitespace tokens) and emit the STAR over the min empty id.
    # Never all-pairs (O(n²) driver bomb at crawl scale): the star is
    # O(n) rows, built by a distributed map over the empty-id Dataset;
    # the driver holds ONE scalar (the root id).
    def empty_ids(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")  # null text == no words
        trimmed = pc.utf8_trim_whitespace(text)
        mask = pc.equal(pc.utf8_length(trimmed), 0)
        return pa.Table.from_pydict(
            {"doc_id": pc.cast(batch["doc_id"], pa.int64()).filter(mask)}
        )

    from ray.data.aggregate import Min

    empties = _read_docs(sf_dir).map_batches(
        empty_ids, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if empties.count() > 1:
        root = empties.aggregate(Min("doc_id", alias_name="root"))["root"]

        def star(t: pa.Table) -> pa.Table:
            others = t["doc_id"].filter(pc.not_equal(t["doc_id"], root))
            n = len(others)
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([root] * n, type=pa.int64()),
                    "doc_b": others,
                    "jaccard_sim": pa.array([1.0] * n, type=pa.float64()),
                }
            )

        scored = scored.union(
            empties.map_batches(star, batch_format="pyarrow", zero_copy_batch=True)
        )
    return scored.sort(["doc_a", "doc_b"])


# -- embedding cosine near-dup ------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.95, max_vectors: int = 200_000):
    """Pairs of embeddings with cosine similarity > threshold. The
    normalized matrix is broadcast via ray.put once; each batch does one
    numpy matmul against it (vectorized brute force — the exact
    baseline). This path is HARD-GATED to ``max_vectors``: it is the
    test-scale exact baseline only; the LSH-bucketed scale path is
    ``similarity.embedding_neardup_lsh`` (no full-matrix broadcast)."""
    import ray

    from ..sources.readers import read_table

    ds = read_table(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    n_total = ds.count()
    if n_total > max_vectors:
        raise ValueError(
            f"embedding_neardup_pairs is the exact small-scale baseline "
            f"(n={n_total} > cap {max_vectors}); use embedding_neardup_lsh"
        )
    all_rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ref = ray.put((ids, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        from .similarity import embedding_matrix

        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bmat = embedding_matrix(batch["embedding"], np.float64)
        bn = np.linalg.norm(bmat, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        bmat = bmat / bn
        gids, gmat = ray.get(ref)
        sims = bmat @ gmat.T  # (batch, n)
        # upper triangle only (id_a < id_b), fully vectorized
        hit_i, hit_j = np.nonzero((sims > threshold) & (bids[:, None] < gids[None, :]))
        return pa.Table.from_arrays(
            [
                pa.array(bids[hit_i], type=pa.int64()),
                pa.array(gids[hit_j], type=pa.int64()),
                pa.array(sims[hit_i, hit_j], type=pa.float64()),
            ],
            names=["id_a", "id_b", "cosine_sim"],
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=256)


# -- winnowing fingerprint overlap (substring-dup candidates) ------------

def winnow_overlap_pairs(sf_dir: str, min_shared: int = 5, max_df: int = 100_000):
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    (Schleimer'03 local fingerprints -> shared-substring candidates, the
    MOSS shape). Same scale pattern as the n-gram inverted index: one
    fingerprinting pass explodes to (fp, doc_id) rows, fingerprints
    hash into classes, each class emits per-pair partial counts via one
    vectorized Arrow self-join (stop-fingerprints with df > ``max_df``
    dropped, logged), and a global groupby sums the partials."""
    from ray.data.aggregate import Sum

    from ..functions.textstats import winnow_fingerprints

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, fp_out = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for h in set(winnow_fingerprints(t)):
                ids_out.append(d)
                fp_out.append(h)
        fp_arr = np.array(fp_out, dtype=np.uint64).astype(np.int64)  # wrap to int64 key
        return pa.Table.from_pydict(
            {
                "fp": pa.array(fp_arr, type=pa.int64()),
                "doc_id": pa.array(ids_out, type=pa.int64()),
            }
        )

    postings = _read_docs(sf_dir).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True, batch_size=1024
    )

    n_classes = 64

    def add_class(t: pa.Table) -> pa.Table:
        cls = (
            t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64) % n_classes
        ).astype("int32")
        return t.append_column("cls", pa.array(cls))

    def class_pairs(group: pa.Table) -> pa.Table:
        import logging

        g = group.select(["fp", "doc_id"]).combine_chunks()
        df = pc.value_counts(g["fp"])
        heavy = df.filter(pc.greater(pc.struct_field(df, "counts"), max_df))
        if len(heavy) > 0:
            logging.getLogger(__name__).warning(
                "%d stop-fingerprints with df > %d dropped", len(heavy), max_df
            )
            g = g.filter(
                pc.invert(pc.is_in(g["fp"], value_set=pc.struct_field(heavy, "values")))
            )
        empty = pa.Table.from_pydict(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        left = g.rename_columns(["fp", "doc_a"])
        right = g.rename_columns(["fp", "doc_b"])
        joined = left.join(right, keys=["fp"], join_type="inner")
        pairs = joined.filter(pc.less(joined["doc_a"], joined["doc_b"]))
        if pairs.num_rows == 0:
            return empty
        agg = pairs.group_by(["doc_a", "doc_b"]).aggregate([("fp", "count")])
        return pa.Table.from_arrays(
            [agg["doc_a"], agg["doc_b"], pc.cast(agg["fp_count"], pa.int64())],
            names=["doc_a", "doc_b", "n_shared"],
        )

    out = _dedupe_pairs_bucketed(
        postings.map_batches(add_class, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cls")
        .map_groups(class_pairs, batch_format="pyarrow", zero_copy_batch=True),
        [("n_shared", "sum")],
        ["doc_a", "doc_b", "n_shared"],
    )

    def threshold(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_shared"], min_shared))

    return out.map_batches(
        threshold, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["doc_a", "doc_b"])


# -- incremental dedup against a persisted ingest state -------------------

def dedup_against_state(sf_dir: str, n_buckets: int = 16):
    """Incremental ingestion dedup — the production shape for a corpus
    that grows batch by batch: classify every INCOMING document against
    a persisted STATE of already-ingested content hashes, without
    re-deduping the whole corpus. Here the state is simulated
    scale-free as the even doc_ids (already ingested) and the odd
    doc_ids are the incoming increment.

    Statuses: ``new`` (hash unseen), ``dup_state`` (hash already in the
    ingest state), ``dup_incoming`` (hash first seen earlier — lower
    doc_id — within this same increment).

    Scale shape: both sides project to (hash-prefix bucket, hash[, id])
    BEFORE the one co-partition exchange (the bucketed_filter_join
    skeleton, but the membership test is on the FULL hash string inside
    each bucket, and the incoming side also resolves first-seen within
    the bucket — rows with equal hashes share a bucket by
    construction). The state never broadcasts: at 100 TB the ingest
    index is billions of hashes and must shuffle, not ship."""
    from ray.data.aggregate import Min

    ds = _read_docs(sf_dir)
    hashed = ds.map_batches(
        add_content_hash, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "content_hash"])

    def tag(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        h = batch["content_hash"]
        # bucket on the 48-bit hash prefix, co-locating equal hashes
        import numpy as np

        pref = np.array(
            [int(x[:12], 16) % n_buckets for x in h.to_pylist()], dtype=np.int32
        )
        even = pc.equal(pc.bit_wise_and(ids, pa.scalar(1, type=pa.int64())),
                        pa.scalar(0, type=pa.int64()))
        side = pc.if_else(even, pa.scalar("S"), pa.scalar("I"))
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "h": h,
                "__bucket": pa.array(pref),
                "__side": side,
            }
        )

    def classify(group: pa.Table) -> pa.Table:
        state_mask = pc.equal(group["__side"], "S")
        state_h = pc.unique(group.filter(state_mask)["h"])
        inc = group.filter(pc.invert(state_mask))
        if inc.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "status": pa.array([], type=pa.string()),
                }
            )
        # first-seen within the increment: min doc_id per hash
        firsts = inc.select(["h", "doc_id"]).group_by("h").aggregate(
            [("doc_id", "min")]
        )
        first_by_h = dict(
            zip(firsts["h"].to_pylist(), firsts["doc_id_min"].to_pylist())
        )
        in_state = pc.is_in(inc["h"], value_set=state_h).to_pylist()
        ids = inc["doc_id"].to_pylist()
        hs = inc["h"].to_pylist()
        status = [
            "dup_state" if s
            else ("dup_incoming" if first_by_h[h] < i else "new")
            for s, h, i in zip(in_state, hs, ids)
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )

    return (
        hashed.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(classify, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def dup_cluster_histogram(sf_dir: str):
    """Dedup diagnostics: the distribution of exact-duplicate cluster
    sizes — (cluster_size, n_clusters, n_docs) — the number a curation
    run reports before deciding thresholds. Same projection-first scan
    as ``dedup_exact`` (only (hash, doc) ever shuffles), then the
    cluster-size aggregate collapses to a histogram via per-batch
    partials and one tiny second groupby."""
    from ray.data.aggregate import Count, Sum

    ds = _read_docs(sf_dir)
    hashed = ds.map_batches(
        add_content_hash, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["content_hash", "doc_id"])
    clusters = hashed.groupby("content_hash").aggregate(
        Count(alias_name="size")
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["size"]).group_by("size").aggregate([("size", "count")])
        return g.rename_columns(["cluster_size", "n"])

    return (
        clusters.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("cluster_size")
        .aggregate(Sum("n", alias_name="n_clusters"))
        .map_batches(
            lambda b: b.append_column(
                "n_docs",
                pc.multiply(
                    pc.cast(b["cluster_size"], pa.int64()),
                    pc.cast(b["n_clusters"], pa.int64()),
                ),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("cluster_size")
    )


def dup_rate_by_source(sf_dir: str):
    """Curation report: exact-duplicate rate per source — for each
    source, how many documents are non-keeper copies of some duplicate
    cluster. The keeper is min doc_id per content hash (dedup_exact
    semantics): the (hash, doc, source) projection shuffles once on a
    hash bucket, each bucket marks non-keepers vectorized, and a tiny
    groupby(source) folds the counts."""
    import numpy as np
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=("doc_id", "text", "source"))
    hashed = ds.map_batches(
        add_content_hash, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["content_hash", "doc_id", "source"])

    def add_bucket(t: pa.Table) -> pa.Table:
        b = [int(h[:2], 16) % 64 for h in t["content_hash"].to_pylist()]
        return t.append_column("b", pa.array(b, type=pa.int32()))

    def mark_bucket(group: pa.Table) -> pa.Table:
        h = np.asarray(group["content_hash"].to_pylist(), dtype=object)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h_s, d_s = h[order], d[order]
        first = np.ones(len(h_s), dtype=bool)
        first[1:] = h_s[1:] != h_s[:-1]  # sorted: keeper = first of run
        is_dup = np.zeros(len(h_s), dtype=bool)
        is_dup[order] = ~first
        t = pa.Table.from_pydict(
            {
                "source": group["source"],
                "n": pa.array(np.ones(len(h_s), dtype=np.int64)),
                "n_dup": pa.array(is_dup.astype(np.int64)),
            }
        )
        g = t.group_by("source").aggregate([("n", "sum"), ("n_dup", "sum")])
        return g.rename_columns(["source", "n", "n_dup"])

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(mark_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("n_dup", alias_name="n_duplicates"),
        )
        .sort("source")
    )


def minhash_against_state(
    sf_dir: str,
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 16,
    broadcast_max_matches: int = 100_000,
):
    """Incremental NEAR-dup ingestion — ``dedup_against_state``'s
    production shape upgraded from exact hashes to MinHash similarity:
    classify every INCOMING document (odd doc_ids, the scale-free
    increment simulation shared with dedup_against_state) against the
    persisted STATE (even doc_ids) without re-deduping the whole
    corpus. Returns one row per incoming doc, sorted:
    (doc_id, status 'neardup_state'|'new', match_doc_id = min verified
    state match or -1, n_matches).

    Scale shape: band buckets co-locate state and incoming signatures
    in the SAME banded exchange the batch dedup uses (the state never
    broadcasts — at 100 TB it is billions of signatures and must
    shuffle); ``pair_filter`` drops same-side pairs BEFORE the
    pair-text verify so Jaccard runs only on incoming-vs-state
    candidates; the per-incoming match rollup is bounded by verified
    near-dup pairs and attaches by the broadcast-vs-shuffle gate."""
    import numpy as np

    from ray.data.aggregate import Count, Min

    def cross_side(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((a % 2) != (b % 2)))

    verified, _, _ = minhash_verified_pairs(
        sf_dir, threshold, n_perm, n_bands, pair_filter=cross_side
    )

    incoming = _read_docs(sf_dir, columns=("doc_id",)).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()), 1),
                pa.scalar(1, type=pa.int64()),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def finalize(batch: pa.Table, match_ids, match_min, match_n) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(match_ids, ids)
        hit = (idx < len(match_ids)) & (
            match_ids[np.minimum(idx, max(len(match_ids) - 1, 0))] == ids
            if len(match_ids)
            else np.zeros(len(ids), dtype=bool)
        )
        safe = np.minimum(idx, max(len(match_ids) - 1, 0))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "status": pa.array(
                    np.where(hit, "neardup_state", "new").tolist(),
                    type=pa.string(),
                ),
                "match_doc_id": pa.array(
                    np.where(hit, match_min[safe] if len(match_ids) else -1, -1),
                    type=pa.int64(),
                ),
                "n_matches": pa.array(
                    np.where(hit, match_n[safe] if len(match_ids) else 0, 0),
                    type=pa.int64(),
                ),
            }
        )

    if verified is None:
        empty = (np.array([], dtype=np.int64),) * 3
        return incoming.map_batches(
            lambda t: finalize(t, *empty),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sort("doc_id")

    def to_inc(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_is_inc = (a % 2) == 1
        return pa.Table.from_pydict(
            {
                "inc_id": pa.array(np.where(a_is_inc, a, b), type=pa.int64()),
                "st_id": pa.array(np.where(a_is_inc, b, a), type=pa.int64()),
            }
        )

    matches = (
        verified.map_batches(to_inc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("inc_id")
        .aggregate(
            Count(alias_name="n_matches"),
            Min("st_id", alias_name="match_doc_id"),
        )
        .materialize()
    )
    n = matches.count()
    if n <= broadcast_max_matches:
        tbl = pa.concat_tables(
            matches.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        mi = tbl["inc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(mi)
        consts = (
            mi[order],
            tbl["match_doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[order],
            tbl["n_matches"].to_numpy(zero_copy_only=False).astype(np.int64)[order],
        )
        return incoming.map_batches(
            lambda t: finalize(t, *consts),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sort("doc_id")

    from .joins import bucketed_join

    joined = bucketed_join(
        incoming, matches, "doc_id", "inc_id", join_type="left outer"
    )

    def fill(batch: pa.Table) -> pa.Table:
        hit = pc.is_valid(batch["match_doc_id"])
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "status": pc.if_else(
                    hit, pa.scalar("neardup_state"), pa.scalar("new")
                ),
                "match_doc_id": pc.cast(
                    pc.fill_null(batch["match_doc_id"], -1), pa.int64()
                ),
                "n_matches": pc.cast(pc.fill_null(batch["n_matches"], 0), pa.int64()),
            }
        )

    return joined.map_batches(
        fill, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")
