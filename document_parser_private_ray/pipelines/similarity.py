"""Similarity search over an embedding column (list<float>).

* ``ann_bruteforce_topk`` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``); every batch does one numpy matmul and
  emits its LOCAL top-k per query; a final tiny groupby-merge keeps the
  global top-k. The shuffle moves (n_queries x k) rows per batch, never
  vectors.
* ``ann_lsh_topk`` — sign-random-projection LSH buckets as the scale
  path: vectors hash to 2^n_bits buckets; queries probe their own bucket
  (+ optional multi-probe neighbours); exact rerank inside the probed
  buckets. Recall is measured against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _read_embeddings(sf_dir: str):
    from ..sources.readers import read_table

    return read_table(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])


def load_queries(sf_dir: str, n_queries: int = 8) -> tuple:
    """Deterministic query set: the first n_queries embeddings by vec_id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    order = pc.sort_indices(t["vec_id"])[:n_queries]
    ids = pc.take(t["vec_id"], order).to_pylist()
    vecs = pc.take(t["embedding"], order).to_pylist()
    qmat = _norm_rows(np.array(vecs, dtype=np.float32))
    return np.asarray(ids, dtype=np.int64), qmat


def ann_bruteforce_topk(sf_dir: str, k: int = 5, n_queries: int = 8):
    """Exact top-k cosine neighbours for each query vector.
    Returns (query_id, vec_id, cosine_sim, rank) sorted."""
    import ray

    qids, qmat = load_queries(sf_dir, n_queries)
    qref = ray.put((qids, qmat))

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(
            np.array(batch["embedding"].to_pylist(), dtype=np.float32)
        )
        q_ids, q_mat = ray.get(qref)
        sims = q_mat @ mat.T  # (nq, batch)
        out = {"query_id": [], "vec_id": [], "cosine_sim": []}
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # deterministic local top-k: (sim desc, vec_id asc) — a tie
            # at the k-boundary must not be cut arbitrarily, or the
            # global merge sees a different candidate set per run
            order = np.lexsort((ids, -sims[qi]))
            top = order[:kk]
            for j in top:
                out["query_id"].append(int(q_ids[qi]))
                out["vec_id"].append(int(ids[j]))
                out["cosine_sim"].append(float(sims[qi, j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "cosine_sim": pa.array(out["cosine_sim"], type=pa.float64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    locals_ = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=1024)

    def merge_group(group):
        # deterministic rank: ties in cosine_sim break by vec_id asc —
        # matches the oracle's ROW_NUMBER() OVER (ORDER BY sim DESC,
        # vec_id). Local top-k above keeps k rows per (query, batch), so
        # every global tie candidate survives to this merge.
        g = (
            group.sort_values(["cosine_sim", "vec_id"], ascending=[False, True])
            .head(k)
            .copy()
        )
        g["rank"] = range(1, len(g) + 1)
        return g

    return (
        locals_.groupby("query_id")
        .map_groups(merge_group, batch_format="pandas")
        .sort(["query_id", "rank"])
    )


class SignLSH:
    """Sign-random-projection hasher (stateful: the projection matrix
    lives once per actor). bucket = bits of sign(R @ v)."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(n_bits, dim)).astype(np.float32)
        self.n_bits = n_bits

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (self.planes @ mat.T) > 0  # (bits, n)
        weights = (1 << np.arange(self.n_bits)).astype(np.int64)
        return (signs.T @ weights).astype(np.int64)


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.45, n_bits: int = 4, n_tables: int = 8,
    max_bucket: int = 8192,
):
    """Scale path for embedding near-dup: multi-table sign-LSH bucketing
    -> pairwise cosine only within buckets -> distinct pairs. No full
    matrix ever materializes anywhere; the shuffle moves (table, bucket,
    vec_id, embedding) rows. Recall vs the exact baseline rises with
    n_tables (measured in tests); candidates are verified exactly, so
    precision is 1.0."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = _read_embeddings(sf_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(), dtype=np.float64))
        out_t, out_b, out_id, out_vec = [], [], [], []
        for t in range(n_tables):
            lsh = SignLSH(mat.shape[1], n_bits, seed=100 + t)
            buckets = lsh.bucket_of(mat.astype(np.float32))
            out_t.extend([t] * len(ids))
            out_b.extend(int(b) for b in buckets)
            out_id.extend(int(i) for i in ids)
            out_vec.extend(mat.tolist())
        return pa.Table.from_pydict(
            {
                "table": pa.array(out_t, type=pa.int32()),
                "bucket": pa.array(out_b, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "vec": pa.array(out_vec, type=pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        if len(ids) < 2:
            return pa.Table.from_pydict(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
            )
        mat = np.array(group["vec"].to_pylist(), dtype=np.float64)
        if len(ids) > max_bucket:
            # oversize bucket (e.g. zero-vector / constant-embedding
            # spam): verify only the star over the min id — O(n)
            # instead of the O(n²) straggler; connectivity for
            # clustering survives, redundant clique edges drop.
            import logging

            logging.getLogger(__name__).warning(
                "sign-LSH bucket of %d members exceeds cap %d: star verify",
                len(ids), max_bucket,
            )
            order = np.argsort(ids, kind="stable")
            root = order[0]
            sims_root = mat[order[1:]] @ mat[root]
            a_out, b_out = [], []
            for pos, s in zip(order[1:], sims_root):
                if ids[pos] != ids[root] and s > threshold:
                    a, b = sorted((int(ids[root]), int(ids[pos])))
                    a_out.append(a)
                    b_out.append(b)
            return pa.Table.from_pydict(
                {"id_a": pa.array(a_out, type=pa.int64()), "id_b": pa.array(b_out, type=pa.int64())}
            )
        sims = mat @ mat.T
        a_out, b_out = [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j]:
                    continue
                if sims[i, j] > threshold:
                    a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                    a_out.append(int(a))
                    b_out.append(int(b))
        return pa.Table.from_pydict(
            {"id_a": pa.array(a_out, type=pa.int64()), "id_b": pa.array(b_out, type=pa.int64())}
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True, batch_size=2048)
        .groupby(["table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # same pair can collide in several tables -> distinct
    return pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_collisions")).sort(["id_a", "id_b"])


def ann_lsh_topk(sf_dir: str, k: int = 5, n_queries: int = 8, n_bits: int = 6):
    """LSH-bucketed ANN: rerank only inside each query's bucket.
    Scale path: bucket assignment is a map_batches; the per-bucket rerank
    shuffles only bucketed candidates (a 2^n_bits-way partition)."""
    import ray

    qids, qmat = load_queries(sf_dir, n_queries)
    dim = qmat.shape[1]
    lsh = SignLSH(dim, n_bits)
    qbuckets = lsh.bucket_of(qmat)
    # queries grouped by bucket, broadcast
    qref = ray.put((qids, qmat, qbuckets))

    def bucket_and_score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _norm_rows(np.array(batch["embedding"].to_pylist(), dtype=np.float32))
        hasher = SignLSH(mat.shape[1], n_bits)  # deterministic (same seed)
        buckets = hasher.bucket_of(mat)
        q_ids, q_mat, q_buckets = ray.get(qref)
        out = {"query_id": [], "vec_id": [], "cosine_sim": []}
        for qi in range(len(q_ids)):
            mask = buckets == q_buckets[qi]
            if not mask.any():
                continue
            sims = mat[mask] @ q_mat[qi]
            for j, s in zip(ids[mask], sims):
                out["query_id"].append(int(q_ids[qi]))
                out["vec_id"].append(int(j))
                out["cosine_sim"].append(float(s))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "cosine_sim": pa.array(out["cosine_sim"], type=pa.float64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    cands = ds.map_batches(bucket_and_score, batch_format="pyarrow", batch_size=1024)

    def merge_group(group):
        # deterministic tie-break: (cosine_sim desc, vec_id asc), as in
        # the oracle's ROW_NUMBER ordering
        g = (
            group.sort_values(["cosine_sim", "vec_id"], ascending=[False, True])
            .head(k)
            .copy()
        )
        g["rank"] = range(1, len(g) + 1)
        return g

    return (
        cands.groupby("query_id")
        .map_groups(merge_group, batch_format="pandas")
        .sort(["query_id", "rank"])
    )


# -- IVF (inverted-file) ANN ---------------------------------------------

def train_ivf_centroids(
    sf_dir: str, n_centroids: int = 16, train_sample: int = 512, n_iter: int = 8
):
    """Deterministic k-means coarse quantizer: fixed init (the first
    n_centroids training vectors by vec_id), fixed iteration count,
    float64 throughout. Trains on a driver-side sample — the standard
    IVF recipe (train small, assign everywhere); the centroid matrix is
    tiny and broadcasts to every assign task (and inlines into the
    DuckDB oracle as literals, so both engines share the exact
    quantizer)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])[:train_sample]
    X = np.array(pc.take(t["embedding"], order).to_pylist(), dtype=np.float64)
    C = X[:n_centroids].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(0)
    return C


def ann_ivf_topk(
    sf_dir: str,
    k: int = 5,
    n_queries: int = 8,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 512,
):
    """IVF-style ANN: vectors partition into centroid cells (nearest
    squared-L2, lowest-cid tie-break), each query probes its n_probe
    nearest cells, exact cosine rerank inside the probed cells only.
    Same merge/rank determinism as ``ann_bruteforce_topk``; candidate
    volume per batch is bounded by the probed cells' occupancy instead
    of the whole batch."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    C = train_ivf_centroids(sf_dir, n_centroids, train_sample)

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])[:n_queries]
    qids = np.asarray(pc.take(t["vec_id"], order).to_pylist(), dtype=np.int64)
    qraw = np.array(pc.take(t["embedding"], order).to_pylist(), dtype=np.float64)
    qnorm = _norm_rows(qraw)
    # probe sets: n_probe nearest centroids per query (dist asc, cid asc)
    qd = ((qraw[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    probe = np.argsort(qd, axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((C, qids, qnorm, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        Cm, q_ids, q_norm, q_probe = ray.get(ref)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        raw = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        d = (
            (raw**2).sum(1, keepdims=True)
            - 2.0 * raw @ Cm.T
            + (Cm**2).sum(1)[None, :]
        )
        assign = d.argmin(1)
        normed = _norm_rows(raw)
        out = {"query_id": [], "vec_id": [], "cosine_sim": []}
        for qi in range(len(q_ids)):
            mask = np.isin(assign, q_probe[qi])
            if not mask.any():
                continue
            cand_ids = ids[mask]
            sims = normed[mask] @ q_norm[qi]
            kk = min(k, len(cand_ids))
            sel = np.lexsort((cand_ids, -sims))[:kk]
            for j in sel:
                out["query_id"].append(int(q_ids[qi]))
                out["vec_id"].append(int(cand_ids[j]))
                out["cosine_sim"].append(float(sims[j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "cosine_sim": pa.array(out["cosine_sim"], type=pa.float64()),
            }
        )

    ds = _read_embeddings(sf_dir)
    locals_ = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=1024)

    def merge_group(group):
        g = (
            group.sort_values(["cosine_sim", "vec_id"], ascending=[False, True])
            .head(k)
            .copy()
        )
        g["rank"] = range(1, len(g) + 1)
        return g

    return (
        locals_.groupby("query_id")
        .map_groups(merge_group, batch_format="pandas")
        .sort(["query_id", "rank"])
    )
