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

from ..functions.sketches import MinHasher, hamming64, jaccard, shingles, simhash64


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# -- exact dedup ---------------------------------------------------------

def add_content_hash(batch: pa.Table) -> pa.Table:
    import hashlib

    h = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def dedup_exact(sf_dir: str):
    """Survivors of exact-text dedup: keep the min doc_id per distinct
    text. Projection to (hash, doc_id) BEFORE the shuffle."""
    from ray.data.aggregate import Count, Min

    ds = _read_docs(sf_dir)
    hashed = ds.map_batches(add_content_hash, batch_format="pyarrow", zero_copy_batch=True).select_columns(
        ["content_hash", "doc_id"]
    )
    return (
        hashed.groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_copies"))
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


def minhash_candidate_pairs(sf_dir: str, n_perm: int = 128, n_bands: int = 16):
    """(doc_a, doc_b) candidate pairs from shared LSH buckets."""
    ds = _read_docs(sf_dir)
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"n_perm": n_perm, "n_bands": n_bands},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=512,
        concurrency=(1, 4),
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        t = pa.Table.from_arrays(
            [pa.array(a, type=pa.int64()), pa.array(b, type=pa.int64())],
            names=["doc_a", "doc_b"],
        )
        return t

    pairs = sigs.groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pyarrow", zero_copy_batch=True)
    # distinct pairs (same pair can collide in several bands)
    return pairs.groupby(["doc_a", "doc_b"]).count()


def dedup_minhash(sf_dir: str, threshold: float = 0.8, n_perm: int = 128, n_bands: int = 16):
    """Near-dup clusters: LSH candidates -> exact Jaccard verify ->
    survivor = min doc_id per connected component.

    The verify stage is distributed: only the CANDIDATE documents' texts
    are fetched (pushdown filter on doc_id), shingled once, broadcast via
    ray.put, and the candidate-pair dataset maps over them in parallel.
    Only the final (small) verified edge list reaches the driver for
    union-find."""
    import ray

    pairs_ds = minhash_candidate_pairs(sf_dir, n_perm, n_bands)
    pairs = pairs_ds.to_pandas()  # candidate edges: tiny vs corpus
    if len(pairs) == 0:
        return {"n_candidate_pairs": 0, "n_verified_pairs": 0, "dropped_doc_ids": []}

    candidate_ids = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    import pyarrow.dataset as pads

    table = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(candidate_ids)
    )
    sh_map = {
        d: shingles(t, 3)
        for d, t in zip(table["doc_id"].to_pylist(), table["text"].to_pylist())
    }
    sh_ref = ray.put(sh_map)

    import ray.data as rd

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        keep_a, keep_b = [], []
        for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
            if jaccard(sh.get(a, set()), sh.get(b, set())) >= threshold:
                keep_a.append(a)
                keep_b.append(b)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(keep_a, type=pa.int64()),
                "doc_b": pa.array(keep_b, type=pa.int64()),
            }
        )

    verified_tbl = (
        rd.from_pandas(pairs[["doc_a", "doc_b"]])
        .map_batches(verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096)
        .to_pandas()
    )
    verified = list(zip(verified_tbl["doc_a"], verified_tbl["doc_b"]))
    # component labels over the verified edge list: union-find here (the
    # edge list is tiny); pipelines.components.connected_components is
    # the distributed min-label-propagation variant for larger graphs
    from .components import union_find

    roots = union_find(verified)
    drops = sorted(d for d, r in roots.items() if r != d)
    return {
        "n_candidate_pairs": len(pairs),
        "n_verified_pairs": len(verified),
        "dropped_doc_ids": drops,
    }


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


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash banding + Hamming verify — fully
    distributed: signatures explode to (band, value, doc_id, simhash)
    rows, a groupby co-locates each band bucket, pairs verify inside
    the group, and a final groupby dedupes pairs that collide in
    several bands. Only the tiny banded table shuffles."""
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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        hs = group["simhash"].to_pylist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                d = hamming64(hs[i], hs[j])
                if d <= max_hamming:
                    out["doc_a"].append(ids[i])
                    out["doc_b"].append(ids[j])
                    out["hamming"].append(d)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out["doc_a"], type=pa.int64()),
                "doc_b": pa.array(out["doc_b"], type=pa.int64()),
                "hamming": pa.array(out["hamming"], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "value"])
        .map_groups(bucket_pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    # a pair can collide in several bands -> dedupe on (doc_a, doc_b)
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .sort(["doc_a", "doc_b"])
    )


# -- n-gram Jaccard (brute within LSH buckets is above; exact small-scale)

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5, k: int = 3):
    """All pairs with shingle-Jaccard >= threshold. Exact quadratic
    verify per bucket is intractable at corpus scale — this operator is
    the *verifier* used behind LSH candidates; standalone it runs on the
    (small) testdata collection via per-batch cross products against a
    broadcast shingle index."""
    import ray

    ds = _read_docs(sf_dir)
    rows = ds.take_all()
    sh = {r["doc_id"]: shingles(r["text"], k) for r in rows}
    ids = sorted(sh)
    ref = ray.put(sh)

    import ray.data as rd

    pairs_ds = rd.from_items([{"doc_a": ids[i]} for i in range(len(ids))])

    def pairs_for(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ordered = sorted(table)
        out_a, out_b, out_j = [], [], []
        for a in batch["doc_a"].to_pylist():
            sa = table[a]
            for b in ordered:
                if b <= a:
                    continue
                j = jaccard(sa, table[b])
                if j >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(j)
        return pa.Table.from_arrays(
            [
                pa.array(out_a, type=pa.int64()),
                pa.array(out_b, type=pa.int64()),
                pa.array(out_j, type=pa.float64()),
            ],
            names=["doc_a", "doc_b", "jaccard_sim"],
        )

    return pairs_ds.map_batches(pairs_for, batch_format="pyarrow", zero_copy_batch=True, batch_size=32)


# -- embedding cosine near-dup ------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.95):
    """Pairs of embeddings with cosine similarity > threshold. The
    normalized matrix is broadcast via ray.put once; each batch does one
    numpy matmul against it (vectorized brute force — the exact
    baseline; the LSH-bucketed scale path is in similarity.py)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in all_rows])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    ref = ray.put((ids, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        bids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        bmat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()]
        )
        bn = np.linalg.norm(bmat, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        bmat = bmat / bn
        gids, gmat = ray.get(ref)
        sims = bmat @ gmat.T  # (batch, n)
        out_a, out_b, out_s = [], [], []
        for i in range(sims.shape[0]):
            mask = sims[i] > threshold
            for j in np.nonzero(mask)[0]:
                if bids[i] < gids[j]:  # upper triangle only
                    out_a.append(int(bids[i]))
                    out_b.append(int(gids[j]))
                    out_s.append(float(sims[i, j]))
        return pa.Table.from_arrays(
            [
                pa.array(out_a, type=pa.int64()),
                pa.array(out_b, type=pa.int64()),
                pa.array(out_s, type=pa.float64()),
            ],
            names=["id_a", "id_b", "cosine_sim"],
        )

    return ds.map_batches(batch_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=256)
