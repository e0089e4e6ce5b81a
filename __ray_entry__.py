"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship parse chain over the deterministic synthetic
interleaved-span corpus (sized from sf0.001).
``queries()`` — one entry per implemented operator/pipeline
(SURVEY.md §2 + the training-data family); each callable takes sf_dir.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query (same column names; aggregates rounded identically on both sides
to absorb float summation-order noise). Non-SQL-expressible pipelines
(regex state machines, sketches, LSH) get rows-only checks.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

SEED = 42
_CORPUS_CACHE = "/tmp/dppr_corpus"


def _corpus_for(sf_dir: str, n_docs: int | None = None) -> str:
    """Deterministic synthetic spans corpus sized from the sf's documents
    table (cached under /tmp per size)."""
    import pyarrow.parquet as pq

    from document_parser_private_ray.sources.corpus import write_corpus_local

    if n_docs is None:
        n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    path = os.path.join(_CORPUS_CACHE, f"n{n_docs}-s{SEED}")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        write_corpus_local(path, n_docs, seed=SEED)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def entry() -> Any:
    """Flagship: read sf0.001-sized synthetic spans corpus -> full parse
    chain -> parsed table (doc_id, out_spans, resume, error)."""
    from document_parser_private_ray.pipelines.resume import parse_resumes, read_corpus

    corpus = _corpus_for("/root/testdata/sf0.001")
    return parse_resumes(read_corpus(corpus), concurrency=(1, 4), batch_size=32)


# --------------------------------------------------------------------------


def _q_parse_resumes(sf_dir: str):
    from document_parser_private_ray.pipelines.resume import parse_resumes, read_corpus

    return parse_resumes(read_corpus(_corpus_for(sf_dir)), concurrency=(2, 8))


def _q_parse_resumes_pii(sf_dir: str):
    """Full chain with the PII stage on: adds anonymized_text + pii_map
    columns (per-document counters, hash strategy)."""
    from document_parser_private_ray.pipelines.resume import parse_resumes, read_corpus

    ds = parse_resumes(
        read_corpus(_corpus_for(sf_dir, n_docs=200)), with_pii=True, concurrency=(2, 8)
    )
    return ds.select_columns(["doc_id", "anonymized_text", "error"])


def _q_detect_sections(sf_dir: str):
    from document_parser_private_ray.pipelines.resume import read_corpus
    from document_parser_private_ray.stages.parse import DetectSectionsStage

    return read_corpus(_corpus_for(sf_dir)).map_batches(
        DetectSectionsStage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


def _q_largest_docs(sf_dir: str):
    """R6 on the corpus: top-20 documents by estimated span cost
    (vectorized cost column -> global sort -> limit) — the skew
    diagnostic the routing threshold is tuned from."""
    from document_parser_private_ray.pipelines.resume import read_corpus
    from document_parser_private_ray.stages.parse import add_cost_column

    ds = read_corpus(_corpus_for(sf_dir)).map_batches(
        add_cost_column, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        ds.select_columns(["doc_id", "est_cost"])
        .sort("est_cost", descending=True)
        .limit(20)
    )


def _q_span_rollup(sf_dir: str):
    from document_parser_private_ray.pipelines.resume import (
        parse_resumes,
        read_corpus,
        resume_rollup,
    )

    return resume_rollup(parse_resumes(read_corpus(_corpus_for(sf_dir)), concurrency=(2, 8)))


def _q_q1(sf_dir: str):
    from document_parser_private_ray.pipelines.relational import q1_pricing_summary

    return _round_cols(q1_pricing_summary(sf_dir), ["sum_base_price", "sum_disc_price"])


def _q_revenue_by_nation(sf_dir: str):
    from document_parser_private_ray.pipelines.relational import revenue_by_nation

    return _round_cols(revenue_by_nation(sf_dir), ["revenue"])


def _q_top_customers(sf_dir: str):
    from document_parser_private_ray.pipelines.relational import (
        top_customers_by_order_value,
    )

    return _round_cols(top_customers_by_order_value(sf_dir), ["total_value"])


def _q_events_hourly(sf_dir: str):
    from document_parser_private_ray.pipelines.relational import events_hourly_window

    return _round_cols(events_hourly_window(sf_dir), ["sum_value"])


def _q_sessionize(sf_dir: str):
    from document_parser_private_ray.pipelines.relational import events_sessionize

    import numpy as np

    def to_cents(df):
        df["sum_value_cents"] = np.floor(df["sum_value"] * 100.0 + 0.5).astype("int64")
        return df.drop(columns=["sum_value"])

    return events_sessionize(sf_dir).map_batches(to_cents, batch_format="pandas")


def _q_asof_join(sf_dir: str):
    """As-of join purchases -> latest prior view per user (merge_asof in
    co-partitioned groups; DuckDB native ASOF JOIN as oracle)."""
    import numpy as np

    from document_parser_private_ray.pipelines.relational import purchases_asof_views

    def to_cents(df):
        df["purchase_value_cents"] = np.floor(df["purchase_value"] * 100.0 + 0.5).astype("int64")
        df["view_value_cents"] = np.floor(df["view_value"] * 100.0 + 0.5).astype("int64")
        return df.drop(columns=["purchase_value", "view_value"])

    return purchases_asof_views(sf_dir).map_batches(to_cents, batch_format="pandas")


def _q_order_lineitem_join(sf_dir: str):
    """Large-large bucketed hash join (orders ⋈ lineitem)."""
    from document_parser_private_ray.pipelines.joins import order_lineitem_revenue

    return _round_cols(order_lineitem_revenue(sf_dir), ["revenue"])


def _q_distinct_segments(sf_dir: str):
    from document_parser_private_ray.pipelines.joins import distinct_values

    return distinct_values(sf_dir, "customer", "c_mktsegment")


def _q_dedup_exact(sf_dir: str):
    from document_parser_private_ray.pipelines.dedup import dedup_exact

    return dedup_exact(sf_dir)


def _q_dedup_minhash(sf_dir: str):
    import pandas as pd

    from document_parser_private_ray.pipelines.dedup import dedup_minhash

    res = dedup_minhash(sf_dir)
    return pd.DataFrame(
        [
            {
                "n_candidate_pairs": res["n_candidate_pairs"],
                "n_verified_pairs": res["n_verified_pairs"],
                "n_dropped": len(res["dropped_doc_ids"]),
            }
        ]
    )


def _q_dedup_simhash(sf_dir: str):
    from document_parser_private_ray.pipelines.dedup import dedup_simhash

    return dedup_simhash(sf_dir)


def _q_ngram_jaccard(sf_dir: str):
    from document_parser_private_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = ngram_jaccard_pairs(sf_dir, threshold=0.5)
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("jaccard_sim"),
            "jaccard_sim",
            pc.round(t["jaccard_sim"], ndigits=6),
        ),
        batch_format="pyarrow",
    )


def _q_embedding_neardup(sf_dir: str):
    from document_parser_private_ray.pipelines.dedup import embedding_neardup_pairs

    # synthetic embeddings top out near cosine 0.5 — 0.45 keeps the
    # operator's output non-trivial at every sf
    return embedding_neardup_pairs(sf_dir, threshold=0.45).select_columns(["id_a", "id_b"])


def _q_embedding_neardup_lsh(sf_dir: str):
    """Scale path: multi-table sign-LSH bucketed near-dup (precision 1.0
    vs the exact baseline; recall measured in tests)."""
    from document_parser_private_ray.pipelines.similarity import embedding_neardup_lsh

    return embedding_neardup_lsh(sf_dir, threshold=0.45)


def _q_ann_bruteforce(sf_dir: str):
    from document_parser_private_ray.pipelines.similarity import ann_bruteforce_topk

    return ann_bruteforce_topk(sf_dir, k=5, n_queries=8).select_columns(
        ["query_id", "vec_id", "rank"]
    )


def _q_ann_lsh(sf_dir: str):
    from document_parser_private_ray.pipelines.similarity import ann_lsh_topk

    return ann_lsh_topk(sf_dir, k=5, n_queries=8).select_columns(
        ["query_id", "vec_id", "rank"]
    )


def _q_doc_quality(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_quality

    return doc_quality(sf_dir)


def _q_doc_quality_extended(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_quality_extended

    return doc_quality_extended(sf_dir)


def _q_doc_tokens(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_tokens

    return doc_tokens(sf_dir).select_columns(["doc_id", "ws_tokens"])


def _q_doc_tokens_bpe(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_tokens

    return doc_tokens(sf_dir)


def _q_doc_language(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import lang_histogram

    return lang_histogram(sf_dir)


def _q_doc_fingerprints(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_fingerprints

    return doc_fingerprints(sf_dir).select_columns(["doc_id", "md5"])


def _q_doc_winnow(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_fingerprints

    return doc_fingerprints(sf_dir).select_columns(["doc_id", "n_winnow"])


def _q_doc_pii(sf_dir: str):
    from document_parser_private_ray.pipelines.text_analysis import doc_pii

    return doc_pii(sf_dir)


def _q_accuracy_eval(sf_dir: str):
    """Eval join (R3) + §5 metrics: parse-chain predictions vs the
    single-doc oracle's golden entities. F1 == 1.0 for every entity type
    IS the invariant (any drop means pipeline/oracle divergence)."""
    import pandas as pd

    from document_parser_private_ray.oracle import DocumentOracle
    from document_parser_private_ray.pipelines.evaluate import (
        evaluate_predictions,
        parsed_to_prediction_columns,
    )
    from document_parser_private_ray.pipelines.resume import parse_resumes, read_corpus
    from document_parser_private_ray.sources.corpus import generate_document

    n_eval = 200
    corpus = _corpus_for(sf_dir, n_docs=n_eval)
    parsed = parse_resumes(read_corpus(corpus), concurrency=(2, 8))
    preds = parsed_to_prediction_columns(parsed)

    oracle = DocumentOracle()
    golden = []
    for i in range(n_eval):
        doc = generate_document(i, SEED)
        sp = doc["spans"]
        out = oracle.process(
            doc["doc_id"], [s["kind"] for s in sp], [s["text"] for s in sp],
            [s["media_ref"] for s in sp],
        )
        r = out["resume"]
        golden.append(
            {
                "doc_id": doc["doc_id"],
                "skills": r["skills"],
                "companies": [e["company"] for e in r["experience"] if e["company"]],
                "education": [e["degree"] for e in r["education"] if e["degree"]],
            }
        )
    metrics = evaluate_predictions(preds, golden)
    return pd.DataFrame(
        [{"entity_type": et, **m} for et, m in sorted(metrics.items())]
    )


def _q_checkpoint_lineage(sf_dir: str):
    """Resumable partitioned run (north rule: per-partition lineage +
    idempotent resume): parse a small corpus through the checkpoint
    runner twice — the second pass must skip every committed partition —
    and return the lineage/counters table."""
    import shutil

    import pandas as pd

    from document_parser_private_ray.sources.corpus import write_corpus_local
    from document_parser_private_ray.state.checkpoint import (
        lineage_table,
        run_resumable,
    )

    src = os.path.join(_CORPUS_CACHE, "ckpt-src")
    if not os.path.exists(os.path.join(src, "_COMPLETE")):
        write_corpus_local(src, 120, seed=SEED, rows_per_file=20)
        with open(os.path.join(src, "_COMPLETE"), "w") as f:
            f.write("ok")
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out = os.path.join(_CORPUS_CACHE, "ckpt-out")
    shutil.rmtree(out, ignore_errors=True)

    def pipeline(ds):
        from document_parser_private_ray.pipelines.resume import parse_resumes

        return parse_resumes(ds, concurrency=(1, 4))

    run_resumable(files, out, pipeline, run_id="r1", files_per_partition=2)
    second = run_resumable(files, out, pipeline, run_id="r2", files_per_partition=2)
    assert second["processed"] == 0 and second["skipped"] == 3
    df = lineage_table(out).to_pandas()
    return df[["partition_id", "doc_count", "span_count", "error_count", "status", "run_id"]]


def _q_media_features(sf_dir: str):
    from document_parser_private_ray.pipelines.media import media_pipeline

    return media_pipeline(n_items=256).select_columns(
        ["media_ref", "kind", "n_bytes", "sha1", "decode_error"]
    )


def _round_cols(ds, cols):
    """Money/value aggregates -> integer cents: floor(x*100 + 0.5) as
    int64 on BOTH engine sides. Cross-engine ROUND() produces different
    nearest-doubles (hash poison); integers compare bit-exactly."""
    import pyarrow.compute as pc

    def rounder(t):
        for c in cols:
            if c in t.column_names:
                cents = pc.cast(
                    pc.floor(pc.add(pc.multiply(t[c], 100.0), 0.5)), "int64"
                )
                t = t.set_column(t.schema.get_field_index(c), c + "_cents", cents)
        return t

    return ds.map_batches(rounder, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship parse chain (non-SQL; pytest span-equality gate)
        "parse_resumes": _q_parse_resumes,
        "parse_resumes_pii": _q_parse_resumes_pii,
        "detect_sections": _q_detect_sections,
        "span_rollup": _q_span_rollup,
        "largest_docs": _q_largest_docs,
        # relational (SQL-verified)
        "q1_pricing_summary": _q_q1,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_customers": _q_top_customers,
        "events_hourly": _q_events_hourly,
        "events_sessionize": _q_sessionize,
        "order_lineitem_join": _q_order_lineitem_join,
        "asof_purchases_views": _q_asof_join,
        "distinct_segments": _q_distinct_segments,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        # similarity search
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_lsh": _q_ann_lsh,
        # text analysis
        "doc_quality": _q_doc_quality,
        "doc_quality_extended": _q_doc_quality_extended,
        "doc_tokens": _q_doc_tokens,
        "doc_tokens_bpe": _q_doc_tokens_bpe,
        "doc_language": _q_doc_language,
        "doc_fingerprints": _q_doc_fingerprints,
        "doc_winnow": _q_doc_winnow,
        "doc_pii": _q_doc_pii,
        # eval join + accuracy metrics (self-check: F1 must be 1.0)
        "accuracy_eval": _q_accuracy_eval,
        # checkpoint/lineage (north rule resumability through the contract)
        "checkpoint_lineage": _q_checkpoint_lineage,
        # multimodal plumbing
        "media_features": _q_media_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(FLOOR(SUM(l_extendedprice) * 100 + 0.5) AS BIGINT) AS sum_base_price_cents,
                   CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS sum_disc_price_cents,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS revenue_cents
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY revenue_cents DESC
        """,
        "top_customers": """
            SELECT o_custkey,
                   CAST(FLOOR(SUM(o_totalprice) * 100 + 0.5) AS BIGINT) AS total_value_cents,
                   COUNT(*) AS n_orders,
                   MIN(c_name) AS c_name
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_custkey
            ORDER BY total_value_cents DESC
            LIMIT 10
        """,
        "events_hourly": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events,
                   CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_value_cents
            FROM events
            GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start
        """,
        "events_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), numbered AS (
                SELECT *, SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   COUNT(*) AS n_events,
                   CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS sum_value_cents
            FROM numbered
            GROUP BY user_id, sid
        """,
        "asof_purchases_views": """
            WITH p AS (
                SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
            ), v AS (
                SELECT user_id, ts AS view_ts, value AS vval FROM events
                WHERE event_type = 'view'
            )
            SELECT p.user_id, p.ts, v.view_ts,
                   CAST(FLOOR(p.value * 100 + 0.5) AS BIGINT) AS purchase_value_cents,
                   CAST(FLOOR(v.vval * 100 + 0.5) AS BIGINT) AS view_value_cents
            FROM p ASOF JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.view_ts
        """,
        "order_lineitem_join": """
            SELECT o_orderkey,
                   CAST(FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT)
                       AS revenue_cents,
                   COUNT(*) AS n_lines,
                   MAX(o_orderdate) AS o_orderdate,
                   MAX(o_orderpriority) AS o_orderpriority
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderkey
            ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
            LIMIT 15
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "dedup_exact": """
            SELECT sha256(text) AS content_hash,
                   MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_copies
            FROM documents
            GROUP BY sha256(text)
            ORDER BY keep_doc_id
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a
            JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) > 0.45
            ORDER BY id_a, id_b
        """,
        "ann_bruteforce": """
            WITH queries AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings ORDER BY vec_id LIMIT 8
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(
                           CAST(q.qvec AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) AS sim
                FROM queries q CROSS JOIN embeddings e
            ), ranked AS (
                SELECT query_id, vec_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, vec_id) AS rank
                FROM scored
            )
            SELECT query_id, vec_id, rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "doc_quality": """
            SELECT doc_id,
                   LENGTH(text) AS n_chars,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+'))
                   END AS n_words,
                   LENGTH(regexp_replace(text, '[^A-Z]', '', 'g'))
                       / GREATEST(LENGTH(text), 1)::DOUBLE AS upper_ratio,
                   LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                       / GREATEST(LENGTH(text), 1)::DOUBLE AS digit_ratio
            FROM documents
            ORDER BY doc_id
        """,
        "doc_quality_extended": """
            SELECT doc_id,
                   LENGTH(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
                       / GREATEST(LENGTH(text), 1)::DOUBLE AS punct_ratio,
                   LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha_chars,
                   LENGTH(regexp_replace(text, '[^ ]', '', 'g')) AS space_chars
            FROM documents
            ORDER BY doc_id
        """,
        "doc_tokens": """
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+'))
                   END AS ws_tokens
            FROM documents
            ORDER BY doc_id
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS md5
            FROM documents
            ORDER BY doc_id
        """,
        # parse_resumes / detect_sections / span_rollup: regex state
        # machines over the synthetic spans corpus — not SQL-expressible;
        # verified by the pytest span-equality suite instead.
        # dedup_minhash / dedup_simhash / ngram_jaccard / ann_lsh /
        # doc_language / doc_winnow / doc_pii / doc_tokens_bpe /
        # media_features: sketch/LSH/heuristic operators -> rows-only.
    }
