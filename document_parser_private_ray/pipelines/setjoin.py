"""Exact set-similarity self-join via prefix filtering (the
AllPairs/PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08).

Complements the probabilistic MinHash-LSH near-dup family with an
EXACT one: every pair of documents whose 3-gram shingle sets have
Jaccard >= t is returned, with no banding recall loss and no
stop-shingle df cap (unlike ``ngram_jaccard_pairs``, which trades
exactness above ``max_df`` for bounded buckets).

Why it scales: candidate generation explodes only each document's
PREFIX — the first ``n - ceil(t*n) + 1`` shingles under one global
total order (ascending document frequency, rarest first). The prefix
theorem (Xiao'08 Lemma 1, restated over per-side overlap bounds):
if J(A,B) >= t then |A∩B| >= ceil(t*|A|) and >= ceil(t*|B|); the
smallest common shingle c in the global order has at most
|A| - ceil(t*|A|) elements of A before it (all other intersection
members sort after c), so c lies in BOTH prefixes — sharing a prefix
posting is therefore a complete candidate generator. Ordering by
ascending df makes prefixes maximally rare, so posting-list groups in
the pair exchange stay small; the subsequent length filter
(t_den*min(|A|,|B|) >= t_num*max) prunes before any text ships, and
the exact verify runs only on surviving pairs via the gated
broadcast-vs-shuffle ``attach_pair_texts``.

Reference parity: the reference engine has no set-similarity join —
this is part of the added large-scale-curation surface (SURVEY §6).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import shingles
from .dedup import _read_docs, attach_pair_texts
from .joins import bucketed_join


def _explode_shingles(batch: pa.Table, k: int) -> pa.Table:
    """One posting row per (shingle, doc); each posting carries the
    doc's set size so no separate size table is ever joined."""
    ids_out, sh_out, n_out = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ss = shingles(t, k)
        ids_out.extend([int(d)] * len(ss))
        sh_out.extend(ss)
        n_out.extend([len(ss)] * len(ss))
    sh_arr = np.array(sh_out, dtype=np.uint64).astype(np.int64)  # wrap to int64 key
    return pa.Table.from_pydict(
        {
            "tok": pa.array(sh_arr, type=pa.int64()),
            "doc_id": pa.array(ids_out, type=pa.int64()),
            "n": pa.array(n_out, type=pa.int64()),
        }
    )


def ppjoin_pairs(
    sf_dir: str,
    t_num: int = 7,
    t_den: int = 10,
    k: int = 3,
    n_buckets: int = 64,
    num_read_blocks: int = 16,
):
    """All document pairs with shingle-set Jaccard >= t_num/t_den,
    EXACT. Returns (doc_a, doc_b, n_common, n_union) sorted — integer
    counts, so the SQL oracle compares with no float hashing channel.

    Stages (each a bounded exchange):
      1. shingle explode -> postings (tok, doc_id, n);
      2. global df per tok: per-batch partial counts -> one small
         groupby (vocab-scale, not corpus-scale);
      3. df rides back onto postings via one hash-bucketed
         co-partition join (``bucketed_join``);
      4. prefix selection: co-partition by doc bucket, ONE lexsort per
         group batch orders every doc's postings by (df, tok), a
         vectorized boundary mask keeps rank < n - ceil(t*n) + 1;
      5. candidate pairs: prefix postings co-partition by tok bucket,
         vectorized Arrow self-join per bucket + the length filter
         t_den*min >= t_num*max, partial pair-dedup in-bucket, global
         dedup in one groupby;
      6. exact verify over ``attach_pair_texts`` (broadcast id-filter
         when the candidate set is small, two co-partition groupbys at
         scale) — never an all-pairs or driver-side text fetch.

    Empty-shingle docs never enter the index: Jaccard over an empty
    set is undefined here (the near-dup families own the empty-doc
    star; see ``ngram_jaccard_pairs``).
    """
    from ray.data.aggregate import Max

    from ..sources.readers import read_table

    # the chain is 6 bounded exchanges over a table small relative to
    # that count — downstream shuffles partition by INCOMING block
    # count, so fuller read blocks cut the fixed per-exchange cost
    # (the pagerank/Q3 idiom); pass None to keep the scanner's split
    docs = read_table(
        f"{sf_dir}/documents.parquet", ("doc_id", "text"),
        override_num_blocks=num_read_blocks,
    )
    postings = docs.map_batches(
        lambda b: _explode_shingles(b, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=1024,
    )

    # -- global document frequency per shingle (partial -> tiny groupby)
    def partial_df(t: pa.Table) -> pa.Table:
        tok, cnt = np.unique(t["tok"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.Table.from_pydict(
            {"tok": pa.array(tok, type=pa.int64()),
             "df_part": pa.array(cnt.astype(np.int64), type=pa.int64())}
        )

    from ray.data.aggregate import Sum

    dftab = (
        postings.map_batches(partial_df, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .aggregate(Sum("df_part", alias_name="df"))
    )

    with_df = bucketed_join(postings, dftab, "tok", "tok", n_buckets=16)

    # -- prefix selection: co-partition by doc, lexsort once per group
    def add_doc_bucket(t: pa.Table) -> pa.Table:
        b = (t["doc_id"].to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return t.append_column("db", pa.array(b))

    def prefix_select(group: pa.Table) -> pa.Table:
        g = group.combine_chunks()
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        df = g["df"].to_numpy(zero_copy_only=False)
        tok = g["tok"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, df, doc))
        doc_s = doc[order]
        # rank of each posting within its doc under the (df, tok) order
        new_doc = np.empty(len(doc_s), dtype=bool)
        if len(doc_s):
            new_doc[0] = True
            new_doc[1:] = doc_s[1:] != doc_s[:-1]
        seg_start = np.maximum.accumulate(np.where(new_doc, np.arange(len(doc_s)), 0))
        rank = np.arange(len(doc_s)) - seg_start
        n_s = n[order]
        # prefix length p = n - ceil(t*n) + 1 (integer ceil)
        p = n_s - (t_num * n_s + t_den - 1) // t_den + 1
        keep = rank < p
        sel = order[keep]
        return pa.Table.from_pydict(
            {
                "tok": pa.array(tok[sel], type=pa.int64()),
                "doc_id": pa.array(doc[sel], type=pa.int64()),
                "n": pa.array(n[sel], type=pa.int64()),
            }
        )

    prefixes = (
        with_df.map_batches(add_doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("db")
        .map_groups(prefix_select, batch_format="pyarrow", zero_copy_batch=True)
    )

    # -- candidate pairs: vectorized self-join per tok bucket
    def add_tok_bucket(t: pa.Table) -> pa.Table:
        b = (t["tok"].to_numpy(zero_copy_only=False) % n_buckets).astype("int32")
        return t.append_column("tb", pa.array(b))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = group.select(["tok", "doc_id", "n"]).combine_chunks()
        empty = pa.Table.from_pydict(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        left = pa.Table.from_arrays(
            [g["tok"], g["doc_id"], g["n"]], names=["tok", "doc_a", "n_a"]
        )
        right = pa.Table.from_arrays(
            [g["tok"], g["doc_id"], g["n"]], names=["tok", "doc_b", "n_b"]
        )
        joined = left.join(right, keys=["tok"], join_type="inner")
        mask = pc.and_(
            pc.less(joined["doc_a"], joined["doc_b"]),
            # length filter: t*max <= min is necessary for J >= t
            pc.greater_equal(
                pc.multiply(
                    pc.min_element_wise(joined["n_a"], joined["n_b"]),
                    pa.scalar(t_den, type=pa.int64()),
                ),
                pc.multiply(
                    pc.max_element_wise(joined["n_a"], joined["n_b"]),
                    pa.scalar(t_num, type=pa.int64()),
                ),
            ),
        )
        pairs = joined.filter(mask)
        if pairs.num_rows == 0:
            return empty
        agg = pairs.group_by(["doc_a", "doc_b"]).aggregate(
            [("n_a", "max"), ("n_b", "max")]
        )
        return agg.rename_columns(["doc_a", "doc_b", "n_a", "n_b"])

    cand = (
        prefixes.map_batches(add_tok_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(bucket_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Max("n_a", alias_name="n_a"), Max("n_b", alias_name="n_b"))
        .materialize()
    )
    n_cand = cand.count()

    schema_out = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("n_common", pa.int64()),
            ("n_union", pa.int64()),
        ]
    )
    if n_cand == 0:
        import ray.data as rd

        return rd.from_arrow(pa.Table.from_pydict({f.name: [] for f in schema_out},
                                                   schema=schema_out))

    with_texts = attach_pair_texts(
        cand.select_columns(["doc_a", "doc_b"]), docs, n_pairs=n_cand
    )

    def verify(batch: pa.Table) -> pa.Table:
        memo: dict = {}

        def sh(doc, text):
            s = memo.get(doc)
            if s is None:
                s = shingles(text, k)
                memo[doc] = s
            return s

        da, db, ni, nu = [], [], [], []
        for a, b, ta, tb_ in zip(
            batch["doc_a"].to_pylist(),
            batch["doc_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            sa, sb = sh(a, ta), sh(b, tb_)
            i = len(sa & sb)
            u = len(sa) + len(sb) - i
            if i * t_den >= t_num * u and u > 0:
                da.append(a)
                db.append(b)
                ni.append(i)
                nu.append(u)
        return pa.Table.from_pydict(
            {"doc_a": da, "doc_b": db, "n_common": ni, "n_union": nu},
            schema=schema_out,
        )

    return (
        with_texts.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["doc_a", "doc_b"])
    )
