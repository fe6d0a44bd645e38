"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduceinfrastructure_spark``; this module
is registry + oracle SQL only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduceinfrastructure_spark.operators import advanced as adv  # noqa: E402
from mapreduceinfrastructure_spark.operators import dedup as dd  # noqa: E402
from mapreduceinfrastructure_spark.operators import graph as gr  # noqa: E402
from mapreduceinfrastructure_spark.operators import mapreduce as mr  # noqa: E402
from mapreduceinfrastructure_spark.operators import multimodal as mm  # noqa: E402
from mapreduceinfrastructure_spark.operators import pipeline as pl  # noqa: E402
from mapreduceinfrastructure_spark.operators import relational as rel  # noqa: E402
from mapreduceinfrastructure_spark.operators import similarity as sim  # noqa: E402
from mapreduceinfrastructure_spark.operators import sketches as sk  # noqa: E402
from mapreduceinfrastructure_spark.operators import text_analysis as ta  # noqa: E402
from mapreduceinfrastructure_spark.operators import sqlapi  # noqa: E402
from mapreduceinfrastructure_spark.operators import timeseries as ts  # noqa: E402
from mapreduceinfrastructure_spark.operators import tpch  # noqa: E402
from mapreduceinfrastructure_spark.streaming import event_stream as es  # noqa: E402

# Delimiter class inside a SQL single-quoted string (the ' is doubled).
_D = "'[ ,.\"'']'"

# Derived part-supplier relation for q2/q11/q20 (no partsupp table in
# the driver data): min/sum over exact doubles, deterministic.
_SQL_PS = """
  ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost,
           sum(l_quantity) AS ps_availqty
    FROM lineitem GROUP BY 1, 2
  )
"""

# Shared CTE fragments for the DuckDB oracles (token pipelines).
_SQL_PAIRS = f"""
  WITH raw AS (
    SELECT doc_id, unnest(string_split_regex(text, {_D})) AS word FROM documents
  ), pairs AS (SELECT doc_id, word FROM raw WHERE length(word) > 0)
"""
_SQL_TOKS = f"""
  WITH toks AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
    FROM documents
  )
"""


def _pagerank_sql() -> str:
    """Exact oracle for ``graph.pagerank_nations``: the 10 fixed
    iterations unrolled as a generated r0..r10 CTE chain (no recursive
    CTE needed for a fixed-iteration algorithm).  Term order mirrors the
    Spark expression — (1-d)/n + d·dm/n + d·inflow — and the final
    round(…, 6) absorbs the ~1e-15 cross-engine float-summation drift."""
    d = gr.DAMPING
    base = repr(1.0 - d)
    head = """
      WITH edges AS MATERIALIZED (
        SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2
      ),
      out_w AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
      trans AS MATERIALIZED (
        SELECT e.src, e.dst, e.w::DOUBLE / e_ow.ow AS p
        FROM edges e JOIN out_w e_ow ON e.src = e_ow.src
      ),
      nodes AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM edges
        UNION SELECT DISTINCT dst FROM edges
      ),
      nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
      dang AS MATERIALIZED (
        SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM edges)
      ),
      r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    steps = []
    for k in range(gr.ITERATIONS):
        steps.append(f"""
      r{k + 1} AS MATERIALIZED (
        SELECT nd.node,
               {base}::DOUBLE / (SELECT n FROM nn)
               + {d!r}::DOUBLE * (
                   SELECT COALESCE(sum(r.rank), 0)
                   FROM r{k} r JOIN dang ON r.node = dang.node
                 ) / (SELECT n FROM nn)
               + {d!r}::DOUBLE * COALESCE(inf.s, 0) AS rank
        FROM nodes nd
        LEFT JOIN (
          SELECT t.dst AS node, sum(t.p * r.rank) AS s
          FROM trans t JOIN r{k} r ON t.src = r.node
          GROUP BY t.dst
        ) inf ON nd.node = inf.node
      )""")
    tail = f"""
      SELECT r.node, n.n_name, round(r.rank, 6) AS rank
      FROM r{gr.ITERATIONS} r JOIN nation n ON r.node = n.n_nationkey
    """
    return head + "," + ",".join(steps) + tail


def _curation_final_sql(sw: str) -> str:
    """Shared oracle CTE chain for the end-to-end curation composition:
    everything up to ``final`` (the surviving docs with per-doc token
    counts) — consumed by both the curation_pipeline accounting and the
    shard_manifest pack accounting.  The quality and stopword scores
    are rounded to 6 decimals BEFORE the threshold compare, mirroring
    operators/pipeline.curated_docs, so boundary decisions are
    representation-stable across engines."""
    return f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            base AS (
              SELECT doc_id, source, len(t) AS nt,
                     round(len(list_filter(list_distinct(t),
                         x -> list_contains([{sw}], x)))::DOUBLE
                       / greatest(len(list_distinct(t)), 1), 6) AS swr,
                     round(least(1.0, len(t) / 100.0) * 0.5
                       + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1)) * 0.3
                       + least(1.0,
                           (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                              / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM toks
            ),
            bgf AS (
              SELECT doc_id, bg, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i+1])) AS bg
                FROM toks
              ) GROUP BY doc_id, bg
            ),
            rep AS (
              SELECT doc_id,
                     CAST(max(c)::DOUBLE / sum(c)::DOUBLE > 0.10 AS BIGINT)
                       AS rep_flag
              FROM bgf GROUP BY doc_id
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 20 = 0),
            contaminated AS (
              SELECT DISTINCT f.doc_id
              FROM flat f JOIN bench b USING (g)
              WHERE f.doc_id % 20 <> 0
            ),
            kept AS (
              SELECT b.*
              FROM base b
              LEFT JOIN rep r USING (doc_id)
              WHERE b.doc_id % 20 <> 0
                AND b.swr >= 0.08
                AND b.q >= 0.5
                AND coalesce(r.rep_flag, 0) = 0
                AND b.doc_id NOT IN (SELECT doc_id FROM contaminated)
            ),
            final AS (
              SELECT k.* FROM kept k
              JOIN (SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp) m
                ON k.fp = m.fp AND k.doc_id = m.doc_id
            )
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's shipped word count) on sf0.001."""
    return ta.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS for the first 50 entries: the driver's correctness
    # harness verifies exactly queries() entries 1-50 against oracle_sql.
    # Round 6 goes all-in on banking the never-driver-verified backlog
    # (VERDICT r5 #1/#8): word_count + grep stay as reference-fidelity
    # anchors, and the other 48 slots are ALL first-time entries — the
    # 12 round-5 operators, inverted_index_mr (the collecting-reduce
    # user task), contamination_report, the full remaining TPC-H
    # backlog (q2-q4, q6-q8, q10-q15, q19, q20, q22 — 15 shapes, which
    # completes banked rows for all 22 TPC-H shapes this round), and
    # the long-tail catalog entries (window_funcs_catalog,
    # scalar_subquery, skew_safe_distinct, token_positions,
    # pagerank_nations, trade_edges, grouping_sets_pricing,
    # pandas_udaf_geomean, udtf_chunk_text, time_rollup,
    # deterministic_sample, embedding_stats, stats_aggregates,
    # not_in_null_aware, argmax_order, nested_roundtrip,
    # cross_join_grid, bag_except, date_funcs).  Deferred to r7 (the
    # three lowest-signal never-green entries): grep_mr (byte-identical
    # oracle to grep), union_all_op, map_explode.  Everything displaced
    # from the r5 window already banked a green driver row in
    # CORRECTNESS_r05 and remains covered by the identical local parity
    # sweep (tests/test_oracle_parity.py).  Every one of the 50 has an
    # exact DuckDB oracle (pinned by
    # tests/test_oracle_parity.py::test_driver_window_is_oracle_backed).
    # Rows-only-by-design variants (ann_*, simhash*, minhash_lsh_neardup,
    # bpe_merges, audio_energy, approx_distinct_users — no DuckDB twin
    # by construction, each carries an equivalence/recall-floor test)
    # sit past 50.
    return {
        # --- reference-fidelity anchors (always windowed) ---
        "word_count": ta.word_count,
        "grep": ta.grep,
        # --- first-timers: MR engine + curation integrity ---
        "inverted_index_mr": mr.inverted_index_mr,
        "contamination_report": pl.contamination_report,
        # --- first-timers: SQL/window/UDF catalog long tail ---
        "window_funcs_catalog": adv.window_funcs_catalog,
        "scalar_subquery": adv.scalar_subquery,
        "skew_safe_distinct": adv.skew_safe_distinct,
        "token_positions": adv.token_positions,
        "grouping_sets_pricing": adv.grouping_sets_pricing,
        "pandas_udaf_geomean": adv.pandas_udaf_geomean,
        "udtf_chunk_text": adv.udtf_chunk_text,
        "time_rollup": adv.time_rollup,
        "deterministic_sample": adv.deterministic_sample,
        "stats_aggregates": adv.stats_aggregates,
        "not_in_null_aware": adv.not_in_null_aware,
        "argmax_order": adv.argmax_order,
        "nested_roundtrip": adv.nested_roundtrip,
        "cross_join_grid": adv.cross_join_grid,
        "bag_except": adv.bag_except,
        "date_funcs": adv.date_funcs,
        # --- first-timers: graph ---
        "pagerank_nations": gr.pagerank_nations,
        "trade_edges": gr.trade_edges,
        # --- first-timers: embeddings ---
        "embedding_stats": sim.embedding_stats,
        "embedding_outliers": sim.embedding_outliers,
        # --- first-timers: the remaining TPC-H backlog (15 shapes) ---
        "tpch_q2": tpch.tpch_q2,
        "tpch_q3": tpch.tpch_q3,
        "tpch_q4": tpch.tpch_q4,
        "tpch_q6": tpch.tpch_q6,
        "tpch_q7": tpch.tpch_q7,
        "tpch_q8": tpch.tpch_q8,
        "tpch_q10": tpch.tpch_q10,
        "tpch_q11": tpch.tpch_q11,
        "tpch_q12": tpch.tpch_q12,
        "tpch_q13": tpch.tpch_q13,
        "tpch_q14": tpch.tpch_q14,
        "tpch_q15": tpch.tpch_q15,
        "tpch_q19": tpch.tpch_q19,
        "tpch_q20": tpch.tpch_q20,
        "tpch_q22": tpch.tpch_q22,
        # --- first-timers: the round-5 analytics ---
        "zipf_slope": ta.zipf_slope,
        "bigram_logprob_score": pl.bigram_logprob_score,
        "weighted_sample": pl.weighted_sample,
        "lang_entropy": pl.lang_entropy,
        "cdc_dup_chunks": dd.cdc_dup_chunks,
        "ngram_novelty": pl.ngram_novelty,
        "corpus_summary": pl.corpus_summary,
        "neardup_audit": dd.neardup_audit,
        # --- first-timers: the three round-5 streaming signals ---
        "streaming_sessions": es.streaming_sessions,
        "streaming_enriched_revenue": es.streaming_enriched_revenue,
        "streaming_curated_ingest": es.streaming_curated_ingest,
        # ---------- entries past the driver window (local parity only) ----------
        "inverted_index": ta.inverted_index,
        "token_stats": ta.token_stats,
        "key_count": rel.key_count,
        "key_stats": rel.key_stats,
        "select_project": rel.select_project,
        "histogram": rel.histogram,
        "join_revenue_by_nation": rel.join_revenue_by_nation,
        "edge_inversion": rel.edge_inversion,
        "distributed_sort": rel.distributed_sort,
        "topk_per_group": rel.topk_per_group,
        "rollup_pricing": rel.rollup_pricing,
        "sessionize": rel.sessionize,
        "join_outer": adv.join_outer,
        "join_full_outer": adv.join_full_outer,
        "salted_join": adv.salted_join,
        "asof_join": adv.asof_join,
        "range_join_events": adv.range_join_events,
        "merge_upsert": adv.merge_upsert,
        "window_frames": adv.window_frames,
        "sql_segment_spend": sqlapi.sql_segment_spend,
        "dedup_exact": dd.dedup_exact,
        "ngram_jaccard_neardup": dd.ngram_jaccard_neardup,
        "dedup_clusters": dd.dedup_clusters,
        "incremental_dedup": dd.incremental_dedup,
        "dup_spans": dd.dup_spans,
        "fuzzy_blocked_join": dd.fuzzy_blocked_join,
        "cosine_topk": sim.cosine_topk,
        "multimodal_features": mm.multimodal_features,
        "funnel_conversion": ts.funnel_conversion,
        "retention_cohorts": ts.retention_cohorts,
        "gap_fill": ts.gap_fill,
        "rolling_time_window": ts.rolling_time_window,
        "triangle_count": gr.triangle_count,
        "decontamination": pl.decontamination,
        "data_mixture": pl.data_mixture,
        "repetition_filter": pl.repetition_filter,
        "unigram_logprob_score": pl.unigram_logprob_score,
        "pack_sequences": pl.pack_sequences,
        "split_assign": pl.split_assign,
        "curation_pipeline": pl.curation_pipeline,
        "shard_manifest": pl.shard_manifest,
        "tpch_q1": tpch.tpch_q1,
        "tpch_q5": tpch.tpch_q5,
        "tpch_q9": tpch.tpch_q9,
        "tpch_q16": tpch.tpch_q16,
        "tpch_q17": tpch.tpch_q17,
        "tpch_q18": tpch.tpch_q18,
        "tpch_q21": tpch.tpch_q21,
        "streaming_active_users": es.streaming_active_users,
        "streaming_hourly_counts": es.streaming_hourly_counts,
        "tf_idf": ta.tf_idf,
        "word_pmi": ta.word_pmi,
        "pii_scrub": ta.pii_scrub,
        "stratified_sample": ta.stratified_sample,
        "distinct_count": rel.distinct_count,
        "join_anti": rel.join_anti,
        "source_overlap": dd.source_overlap,
        "embedding_neardup": sim.embedding_neardup,
        "unpivot_measures": adv.unpivot_measures,
        "percentile_by_brand": adv.percentile_by_brand,
        "json_extract_agg": adv.json_extract_agg,
        "event_transitions": ts.event_transitions,
        "trade_flows_2hop": gr.trade_flows_2hop,
        "keep_best_dedup": pl.keep_best_dedup,
        "mixture_weights": pl.mixture_weights,
        "bpe_token_count": ta.bpe_token_count,
        "rolling_fingerprint": ta.rolling_fingerprint,
        "cube_pricing": adv.cube_pricing,
        "frame_offsets": lambda spark, sf_dir: mm.frame_sample(
            mm.make_media_table(spark, sf_dir)
        ).selectExpr("doc_id", "cast(frame_offset as long) AS frame_offset"),
        "bigram_count": ta.bigram_count,
        "language_id": ta.language_id,
        "quality_score": ta.quality_score,
        "fingerprint": ta.fingerprint,
        "join_semi": rel.join_semi,
        "set_ops": rel.set_ops,
        "global_rank": rel.global_rank,
        "topk_global": rel.topk_global,
        "window_running": rel.window_running,
        "pivot_status": rel.pivot_status,
        "scalar_funcs": adv.scalar_funcs,
        "simhash": dd.simhash,
        "simhash_neardup": dd.simhash_neardup,
        "bpe_merges": ta.bpe_merges,
        "audio_energy": mm.audio_energy,
        "ann_lsh": sim.ann_lsh,
        "ann_ivf": sim.ann_ivf,
        "word_count_mr": mr.word_count_mr,
        "grep_mr": mr.grep_mr,
        "except_op": adv.except_op,
        "approx_distinct_users": adv.approx_distinct_users,
        "prior_order": adv.prior_order,
        "union_all_op": adv.union_all_op,
        "map_explode": adv.map_explode,
        "minhash_lsh_neardup": dd.minhash_lsh_neardup,
        # round-6 additions (window candidates for the next rotation)
        "streaming_curated_ingest_watermarked": es.streaming_curated_ingest_watermarked,
        "token_budget_cap": pl.token_budget_cap,
        "kmeans_step": sim.kmeans_step,
        "bloom_decontaminate": pl.bloom_decontaminate,
        "langid_eval": ta.langid_eval,
        "quality_calibration": pl.quality_calibration,
        "dedup_rate_by_threshold": dd.dedup_rate_by_threshold,
        "semdedup_prune": sim.semdedup_prune,
        "packing_efficiency": pl.packing_efficiency,
        "hll_distinct_users": sk.hll_distinct_users,
        "countmin_heavy_hitters": sk.countmin_heavy_hitters,
        "time_weighted_avg": ts.time_weighted_avg,
        "label_prop_step": gr.label_prop_step,
        "streaming_distinct_users_hll": es.streaming_distinct_users_hll,
        "quantile_sketch_quality": sk.quantile_sketch_quality,
    }


_HLL_ORACLE = f"""
            -- from-scratch HyperLogLog, identical register construction
            WITH ev AS (
              SELECT event_type, user_id::VARCHAR AS u FROM events
            ),
            h AS (
              SELECT event_type, u,
                     ('0x' || substr(md5(u), 1, 12))::BIGINT AS hv
              FROM ev
            ),
            r AS (
              SELECT event_type, hv % {sk.HLL_M} AS bucket,
                     CASE WHEN hv // {sk.HLL_M} > 0
                          THEN {sk._HLL_HASH_BITS - sk.HLL_P + 1} - length(bin(hv // {sk.HLL_M}))
                          ELSE {sk._HLL_HASH_BITS - sk.HLL_P + 1} END AS rk
              FROM h
            ),
            regs AS (
              SELECT event_type, bucket, max(rk) AS r
              FROM r GROUP BY event_type, bucket
            ),
            pt AS (
              SELECT event_type, sum(power(2.0, -r)) AS s,
                     count(*) AS nonzero
              FROM regs GROUP BY event_type
            ),
            ex AS (
              SELECT event_type, count(DISTINCT u) AS n_exact FROM ev GROUP BY event_type
            ),
            est AS (
              SELECT pt.event_type,
                     CASE WHEN {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) <= 2.5 * {sk.HLL_M}
                               AND {sk.HLL_M} - nonzero > 0
                          THEN {sk.HLL_M}::DOUBLE * ln({sk.HLL_M}::DOUBLE / ({sk.HLL_M} - nonzero))
                          ELSE {sk.HLL_ALPHA!r}::DOUBLE * {sk.HLL_M} * {sk.HLL_M}
                               / (s + ({sk.HLL_M} - nonzero)) END AS e
              FROM pt
            )
            SELECT ex.event_type, CAST(n_exact AS BIGINT) AS n_exact,
                   round(e, 4) AS n_hll,
                   round((e - n_exact) / n_exact, 6) AS rel_err
            FROM est JOIN ex ON est.event_type = ex.event_type
        """


def oracle_sql() -> dict[str, str]:
    sw = ",".join(f"'{w}'" for w in ta.EN_STOPWORDS)
    return {
        "word_count": f"""
            {_SQL_PAIRS}
            SELECT word, count(*) AS cnt FROM pairs GROUP BY word
        """,
        # the generic-engine parity query shares word_count's oracle
        "word_count_mr": f"""
            {_SQL_PAIRS}
            SELECT word, count(*) AS cnt FROM pairs GROUP BY word
        """,
        "grep": """
            SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'fast join')
        """,
        "inverted_index": f"""
            {_SQL_PAIRS}
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS n_docs
            FROM pairs GROUP BY word
        """,
        "bigram_count": f"""
            {_SQL_TOKS}
            SELECT t[i] || ' ' || t[i + 1] AS bigram, count(*) AS cnt
            FROM toks, unnest(range(1, len(t))) AS u(i)
            GROUP BY bigram
        """,
        "tf_idf": f"""
            {_SQL_PAIRS},
            tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs GROUP BY doc_id, word),
            idf AS (SELECT word, count(DISTINCT doc_id) AS df FROM pairs GROUP BY word),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT tf.doc_id, tf.word, round(tf.tf * ln(n.n / idf.df), 4) AS tfidf
            FROM tf JOIN idf USING (word) CROSS JOIN n
        """,
        "token_stats": f"""
            {_SQL_TOKS}
            SELECT doc_id,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   round(coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                         / greatest(len(t), 1), 6) AS avg_token_len
            FROM toks
        """,
        "language_id": f"""
            {_SQL_TOKS},
            s AS (
              SELECT doc_id,
                     len(list_filter(list_distinct(t),
                         x -> list_contains([{sw}], x)))::DOUBLE
                       / greatest(len(list_distinct(t)), 1) AS ratio
              FROM toks
            )
            SELECT doc_id, round(ratio, 6) AS stopword_ratio,
                   CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted_lang
            FROM s
        """,
        "quality_score": f"""
            {_SQL_TOKS},
            m AS (
              SELECT doc_id, len(t) AS n_tokens,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            )
            SELECT doc_id, n_tokens, punct_ratio,
                   least(1.0, n_tokens / 100.0) * 0.5
                     + (1.0 - punct_ratio) * 0.3
                     + least(1.0, avg_len / 8.0) * 0.2 AS quality
            FROM m
        """,
        "fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'),
                       x -> length(x) > 0)) AS n_ws_tokens,
                   len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
            FROM documents
        """,
        "rolling_fingerprint": """
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                     (h, c) -> (h * 31 + c) % 1000000007) AS rk_hash
            FROM documents
        """,
        "key_count": """
            SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
        """,
        "key_stats": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(min(l_quantity), 2) AS min_qty,
                   round(max(l_quantity), 2) AS max_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "select_project": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 4) AS net_price
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_quantity > 40
        """,
        "histogram": """
            SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket, count(*) AS cnt
            FROM lineitem GROUP BY bucket
        """,
        "distinct_count": """
            SELECT l_returnflag,
                   count(DISTINCT l_partkey) AS n_parts,
                   count(DISTINCT l_suppkey) AS n_supps
            FROM lineitem GROUP BY l_returnflag
        """,
        "join_revenue_by_nation": """
            SELECT r_name AS region, n_name AS nation,
                   round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "join_anti": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
            )
        """,
        "edge_inversion": """
            SELECT o_custkey,
                   array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
            FROM orders GROUP BY o_custkey
        """,
        "set_ops": """
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
            INTERSECT
            SELECT o_custkey AS custkey FROM orders
        """,
        "distributed_sort": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "global_rank": """
            SELECT p_partkey, p_retailprice,
                   row_number() OVER (ORDER BY p_retailprice, p_partkey) AS rnk
            FROM part
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
            FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                     ) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "topk_global": """
            SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10
        """,
        "window_running": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_spend
            FROM orders
        """,
        "rollup_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pivot_status": """
            SELECT o_orderpriority,
                   count(*) FILTER (o_orderstatus = 'O') AS "O",
                   count(*) FILTER (o_orderstatus = 'F') AS "F",
                   count(*) FILTER (o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority
        """,
        "sessionize": """
            WITH e AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, value, ts_us, event_id,
                     CAST(sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS session_id
              FROM e
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   round(sum(value), 2) AS session_value,
                   min(ts_us) AS start_us,
                   max(ts_us) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "dedup_exact": r"""
            SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
                   min(doc_id) AS keep_id, count(*) AS dup_cnt
            FROM documents GROUP BY fp
        """,
        "ngram_jaccard_neardup": f"""
            {_SQL_TOKS},
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            -- hot-shingle df cap, mirroring dedup.HOT_SHINGLE_DF_CAP
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
            FROM inter
            JOIN cnt ca ON da = ca.doc_id
            JOIN cnt cb ON db = cb.doc_id
            WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.1
        """,
        "cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 50),
            pairs AS (
              SELECT qid, vec_id AS neighbor_id, list_cosine_similarity(qv, v) AS sim
              FROM q, e WHERE vec_id <> qid
            ),
            r AS (
              SELECT qid, neighbor_id, sim,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, neighbor_id) AS rn
              FROM pairs
            )
            SELECT qid, neighbor_id, round(sim, 6) AS cosine, rn
            FROM r WHERE rn <= 5
        """,
        "embedding_neardup": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS da, b.vec_id AS db,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        """,
        "multimodal_features": """
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   hex(encode(text))[1:16] AS head_hex
            FROM documents
        """,
        "except_op": """
            SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "cube_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "unpivot_measures": """
            SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
        """,
        "percentile_by_brand": """
            SELECT p_brand,
                   round(quantile_cont(p_retailprice, 0.25), 6) AS p25,
                   round(quantile_cont(p_retailprice, 0.5), 6) AS p50,
                   round(quantile_cont(p_retailprice, 0.75), 6) AS p75,
                   count(*) AS cnt
            FROM part GROUP BY p_brand
        """,
        "json_extract_agg": """
            WITH e AS (
              SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
            )
            SELECT event_type,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   min(k) AS min_k, max(k) AS max_k, count(k) AS n
            FROM e GROUP BY event_type
        """,
        "scalar_funcs": """
            SELECT o_orderkey,
                   year(o_orderdate) AS yr,
                   month(o_orderdate) AS mo,
                   upper(substring(o_orderpriority, 3, 20)) AS prio,
                   length(o_orderstatus) AS status_len,
                   round(abs(o_totalprice - 1000.0), 2) AS abs_delta,
                   o_orderkey % 7 AS key_mod,
                   concat_ws('-', o_orderstatus, o_orderpriority) AS tag
            FROM orders
        """,
        "prior_order": """
            SELECT o_custkey, o_orderkey,
                   lag(o_orderkey) OVER w AS prev_orderkey,
                   date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "asof_join": """
            WITH j AS (
              SELECT e.event_id, e.user_id, o.o_orderkey,
                     epoch_us(o.o_orderdate) AS order_us,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                     ) AS rn
              FROM events e
              JOIN orders o ON o.o_custkey = e.user_id
                           AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
            )
            SELECT event_id, user_id, o_orderkey, order_us FROM j WHERE rn = 1
        """,
        "range_join_events": """
            WITH ev AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events)
            SELECT a.u, a.event_id AS ea, b.event_id AS eb, b.t - a.t AS gap_us
            FROM ev a JOIN ev b
              ON a.u = b.u AND b.t > a.t AND b.t - a.t <= 300000000
        """,
        "join_outer": """
            SELECT c_custkey,
                   coalesce(u.n_urgent, 0) AS n_urgent,
                   coalesce(u.urgent_total, 0.0) AS urgent_total
            FROM customer
            LEFT JOIN (
              SELECT o_custkey, count(*) AS n_urgent,
                     round(sum(o_totalprice), 2) AS urgent_total
              FROM orders WHERE o_orderpriority = '1-URGENT'
              GROUP BY o_custkey
            ) u ON c_custkey = u.o_custkey
        """,
        "map_explode": """
            WITH kv AS (
              SELECT u.k AS k, CAST(json_extract(props, '$.' || u.k) AS BIGINT) AS v
              FROM events, unnest(json_keys(props)) AS u(k)
            )
            SELECT k, count(*) AS n,
                   CAST(sum(v) AS BIGINT) AS sum_v,
                   min(v) AS min_v, max(v) AS max_v
            FROM kv GROUP BY k
        """,
        "time_rollup": """
            SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
                   event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY bucket_us, event_type
        """,
        # Streaming tumbling-window counts run to completion equal the
        # batch GROUP BY over epoch-aligned hour buckets (UTC session).
        "streaming_hourly_counts": """
            SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_start_us,
                   event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY win_start_us, event_type
        """,
        "union_all_op": """
            WITH t AS (
              SELECT 'order' AS src, o_totalprice AS amount FROM orders
              UNION ALL
              SELECT 'lineitem', l_extendedprice FROM lineitem
            )
            SELECT src, round(sum(amount), 2) AS total, count(*) AS n
            FROM t GROUP BY src
        """,
        "window_funcs_catalog": """
            SELECT o_custkey, o_orderkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   ntile(4) OVER w AS quartile,
                   lead(o_orderkey) OVER w AS next_orderkey,
                   percent_rank() OVER w AS pct_rank,
                   first_value(o_orderkey) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS first_orderkey
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "scalar_subquery": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """,
        "skew_safe_distinct": """
            WITH p AS (
              SELECT event_type, user_id, count(*) AS n
              FROM events GROUP BY event_type, user_id
            )
            SELECT event_type, count(*) AS n_users,
                   CAST(sum(n) AS BIGINT) AS n_events
            FROM p GROUP BY event_type
        """,
        "token_positions": f"""
            {_SQL_TOKS}
            SELECT doc_id, i AS pos, t[i] AS token
            FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
        """,
        "deterministic_sample": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE ('0x' || substring(
                    md5(concat_ws('_', l_orderkey, l_linenumber)), 1, 4
                  ))::INTEGER % 100 < 10
        """,
        "merge_upsert": """
            WITH changes AS (
              SELECT o_custkey AS c_custkey, round(max(o_totalprice), 2) AS new_bal
              FROM orders GROUP BY o_custkey HAVING count(*) > 8
            )
            SELECT c.c_custkey, ch.new_bal AS c_acctbal, TRUE AS restated
            FROM customer c JOIN changes ch USING (c_custkey)
            UNION ALL
            SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal, FALSE AS restated
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = c.c_custkey)
        """,
        "retention_cohorts": """
            WITH act AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) - epoch_us(ts) % 604800000000 AS week_us
              FROM events
            ),
            coh AS (
              SELECT user_id, min(week_us) AS cohort_us FROM act GROUP BY user_id
            )
            SELECT cohort_us,
                   CAST((week_us - cohort_us) / 604800000000 AS BIGINT)
                     AS weeks_since,
                   count(DISTINCT a.user_id) AS n_users
            FROM act a JOIN coh USING (user_id)
            GROUP BY cohort_us, weeks_since
        """,
        "funnel_conversion": """
            WITH ev AS (
              SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
            ),
            v AS (
              SELECT user_id, min(ts_us) AS t_view FROM ev
              WHERE event_type = 'view' GROUP BY user_id
            ),
            c AS (
              SELECT e.user_id, min(e.ts_us) AS t_click
              FROM ev e JOIN v USING (user_id)
              WHERE e.event_type = 'click' AND e.ts_us > v.t_view
              GROUP BY e.user_id
            ),
            p AS (
              SELECT e.user_id, min(e.ts_us) AS t_purchase
              FROM ev e JOIN c USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click
              GROUP BY e.user_id
            ),
            u AS (
              SELECT 1 AS stage, 'view' AS step, user_id FROM v
              UNION ALL SELECT 2, 'click', user_id FROM c
              UNION ALL SELECT 3, 'purchase', user_id FROM p
            )
            SELECT stage, step, count(DISTINCT user_id) AS n_users
            FROM u GROUP BY stage, step
        """,
        "triangle_count": """
            WITH te AS (
              SELECT s_nationkey AS src, c_nationkey AS dst
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            ),
            und AS (
              SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
              FROM te WHERE src <> dst
            ),
            tri AS (
              SELECT a.u AS x, a.v AS y, b.v AS z
              FROM und a
              JOIN und b ON a.v = b.u
              JOIN und c ON c.u = a.u AND c.v = b.v
            )
            SELECT node, count(*) AS n_triangles
            FROM (SELECT unnest([x, y, z]) AS node FROM tri)
            GROUP BY node
        """,
        "trade_edges": """
            SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey, c_nationkey
        """,
        "frame_offsets": """
            SELECT doc_id, CAST(o AS BIGINT) AS frame_offset
            FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents) t,
                 unnest(range(0, greatest(n - 1, 0) + 1, 100)) AS u(o)
        """,
        "pandas_udaf_geomean": """
            SELECT l_returnflag,
                   round(exp(avg(ln(l_quantity))), 6) AS geo_qty
            FROM lineitem
            WHERE l_quantity > 0
            GROUP BY l_returnflag
        """,
        "grouping_sets_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        "udtf_chunk_text": f"""
            {_SQL_TOKS}
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(t[(i - 1) * 10 + 1 : i * 10], ' ') AS chunk,
                   CAST(least(i * 10, len(t)) - (i - 1) * 10 AS BIGINT) AS n_tokens
            FROM toks, unnest(range(1, CAST(ceil(len(t) / 10.0) AS BIGINT) + 1)) AS u(i)
        """,
        "tpch_q3": """
            SELECT l_orderkey, epoch_us(o_orderdate) AS odate_us, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1996-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
        """,
        "tpch_q5": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
              FROM documents
            ),
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db
              FROM inter JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            edges AS (
              SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs
            ),
            walk(node, label) AS (
              SELECT a, a FROM (SELECT DISTINCT a FROM edges)
              UNION
              SELECT e.a, w.label FROM edges e JOIN walk w ON e.b = w.node
            )
            SELECT node AS doc_id, min(label) AS cluster_id
            FROM walk GROUP BY node
        """,
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
        """,
        "tpch_q4": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
              )
            GROUP BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey IN (1, 2) AND c_nationkey IN (1, 2)
              AND s_nationkey <> c_nationkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "tpch_q8": """
            WITH v AS (
              SELECT year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS supp_nation
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
            )
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_3'
                                  THEN volume ELSE 0 END) / sum(volume),
                         6) AS mkt_share
            FROM v GROUP BY o_year
        """,
        "tpch_q9": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   round(sum(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity), 4) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%widget%'
            GROUP BY n_name, year(o_orderdate)
        """,
        "tpch_q12": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_linestatus
        """,
        "tpch_q13": """
            WITH c_orders AS (
              SELECT c_custkey, count(o_orderkey) AS c_count
              FROM customer
              LEFT JOIN orders ON c_custkey = o_custkey
                              AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            )
            SELECT c_count, count(*) AS custdist FROM c_orders GROUP BY c_count
        """,
        "tpch_q14": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                          THEN l_extendedprice * (1 - l_discount)
                                          ELSE 0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "tpch_q15": """
            WITH revenue AS (
              SELECT l_suppkey AS supplier_no,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN revenue ON s_suppkey = supplier_no
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        "tpch_q16": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
              AND l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
        """,
        "tpch_q17": """
            WITH brand_li AS (
              SELECT l.* FROM lineitem l
              JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#3'
            ), th AS (
              SELECT l_partkey AS t_partkey,
                     0.2 * avg(l_quantity) AS qty_threshold
              FROM brand_li GROUP BY l_partkey
            )
            SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
                   count(*) AS n_rows
            FROM brand_li JOIN th ON l_partkey = t_partkey
            WHERE l_quantity < qty_threshold
        """,
        "tpch_q19": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q21": """
            WITH l1 AS (
              SELECT DISTINCT l_orderkey, l_suppkey
              FROM lineitem WHERE l_returnflag = 'R'
            )
            SELECT s_name, count(*) AS numwait
            FROM l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE s_nationkey = 1
              AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R'
              )
              AND EXISTS (
                SELECT 1 FROM orders
                WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
              )
            GROUP BY s_name
        """,
        "tpch_q22": """
            WITH cc AS (
              SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
              FROM customer WHERE c_custkey % 7 IN (0, 1, 2, 3)
            )
            SELECT cntrycode, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM cc
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cc WHERE c_acctbal > 0.0)
              AND NOT EXISTS (
                SELECT 1 FROM orders WHERE o_custkey = cc.c_custkey
              )
            GROUP BY cntrycode
        """,
        "gap_fill": """
            WITH hourly AS (
              SELECT user_id,
                     epoch_us(ts) - epoch_us(ts) % 3600000000 AS bucket_us,
                     round(avg(value), 6) AS hv
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT user_id, min(bucket_us) AS mn, max(bucket_us) AS mx
              FROM hourly GROUP BY user_id
            ), grid AS (
              SELECT user_id, unnest(range(mn, mx + 1, 3600000000)) AS bucket_us
              FROM bounds
            )
            SELECT g.user_id, g.bucket_us,
                   last_value(hv IGNORE NULLS) OVER (
                     PARTITION BY g.user_id ORDER BY g.bucket_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value,
                   CAST(hv IS NOT NULL AS BIGINT) AS is_observed
            FROM grid g LEFT JOIN hourly h USING (user_id, bucket_us)
        """,
        "rolling_time_window": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   count(*) OVER w AS n_1h,
                   round(avg(value) OVER w, 6) AS avg_1h
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        """,
        "pii_scrub": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                                    '<EMAIL>', 'g'),
                     '[0-9]{3,}', '<NUM>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(
                     text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(
                     text, '[0-9]{3,}')) AS BIGINT) AS n_longnums
            FROM documents
        """,
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100
                  < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
        """,
        "dup_spans": f"""
            {_SQL_TOKS},
            sp AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(t) - {dd.SPAN_WIDTH - 2}, {dd.SPAN_STRIDE}),
                       i -> md5(array_to_string(t[i : i + {dd.SPAN_WIDTH - 1}], ' '))
                     )) AS hs
              FROM toks WHERE len(t) >= {dd.SPAN_WIDTH}
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM sp),
            c AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY h)
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum((n_docs >= 2)::INT) AS BIGINT) AS n_dup_spans,
                   round(sum((n_docs >= 2)::INT)::DOUBLE / count(*), 6) AS dup_frac
            FROM ex JOIN c USING (h) GROUP BY doc_id
        """,
        "neardup_audit": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
              FROM inter
              JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            top AS (
              SELECT da, db, jaccard,
                     row_number() OVER (ORDER BY jaccard DESC, da ASC, db ASC)
                       AS rank
              FROM pairs
            )
            SELECT rank, da, db, jaccard,
                   xa.snippet AS text_a, xb.snippet AS text_b
            FROM top
            JOIN (SELECT doc_id, substr(text, 1, 80) AS snippet FROM documents) xa
              ON da = xa.doc_id
            JOIN (SELECT doc_id, substr(text, 1, 80) AS snippet FROM documents) xb
              ON db = xb.doc_id
            WHERE rank <= {dd.AUDIT_TOP_K}
        """,
        "corpus_summary": f"""
            WITH toks AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT len(t) AS nt,
                     least(1.0, len(t) / 100.0) * 0.5
                       + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                              / greatest(length(text), 1)) * 0.3
                       + least(1.0,
                           (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                              / greatest(len(t), 1)) / 8.0) * 0.2 AS q,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM toks
            )
            SELECT (SELECT count(*) FROM m) AS n_docs,
                   (SELECT CAST(sum(nt) AS BIGINT) FROM m) AS n_tokens,
                   (SELECT count(DISTINCT w)
                    FROM (SELECT unnest(t) AS w FROM toks)) AS vocab_size,
                   (SELECT round(avg(q), 6) FROM m) AS mean_quality,
                   round(1.0 - (SELECT count(DISTINCT fp) FROM m)::DOUBLE
                             / greatest((SELECT count(*) FROM m), 1)::DOUBLE,
                         6) AS exact_dup_rate
        """,
        "ngram_novelty": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+4], ' '))))
                       AS g
              FROM toks
            ),
            first AS (SELECT g, min(doc_id) AS first_id FROM grams GROUP BY g)
            SELECT doc_id, count(*) AS n_ngrams,
                   CAST(sum((doc_id = first_id)::INT) AS BIGINT) AS n_novel,
                   round(sum((doc_id = first_id)::INT)::DOUBLE / count(*), 6)
                     AS novelty
            FROM grams JOIN first USING (g)
            GROUP BY doc_id
        """,
        "cdc_dup_chunks": f"""
            WITH cp AS (
              SELECT doc_id, text, length(text) AS n,
                     list_transform(
                       list_filter(string_split(text, ''), c -> c != ''),
                       c -> unicode(c)::BIGINT) AS cps
              FROM documents
            ),
            b AS (
              SELECT doc_id, text, n,
                     list_filter(
                       range({dd.CDC_WINDOW}, greatest(n, {dd.CDC_WINDOW}) + 1),
                       i -> i <= n
                            AND ({" + ".join(f"cps[(i - {j})::INT] * {p}" for j, p in enumerate(dd.CDC_POW))})
                                % {dd.CDC_PRIME} % {dd.CDC_MODULUS} = 0
                     ) AS bpos
              FROM cp
            ),
            s AS (
              SELECT doc_id, text, n,
                     list_prepend(1, list_transform(bpos, x -> x + 1)) AS starts,
                     list_append(bpos, n) AS ends
              FROM b
            ),
            c AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       list_transform(range(1, len(starts) + 1),
                         j -> CASE WHEN ends[j] - starts[j] + 1 >= {dd.CDC_WINDOW}
                                   THEN md5(text[starts[j]:ends[j]]) END),
                       x -> x IS NOT NULL)) AS hs
              FROM s
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM c),
            cnt AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY h)
            SELECT doc_id, count(*) AS n_chunks,
                   CAST(sum((n_docs >= 2)::INT) AS BIGINT) AS n_dup_chunks,
                   round(sum((n_docs >= 2)::INT)::DOUBLE / count(*), 6)
                     AS dup_frac
            FROM ex JOIN cnt USING (h) GROUP BY doc_id
        """,
        "streaming_curated_ingest_watermarked": f"""
            -- watermarked append-mode twin: windows emitted iff the
            -- final watermark (max ingest_ts - 10 min) passed win_end;
            -- ingest_ts is the synthesized (doc_id % 60) minutes.
            WITH toks AS (
              SELECT doc_id, source, text,
                     (doc_id % 60) * 60 AS ts_s,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            mx AS (SELECT max(ts_s) AS mx FROM toks),
            m AS (
              SELECT doc_id, source, text, ts_s, len(t) AS nt,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            ),
            kept AS (
              SELECT doc_id, source, nt, (ts_s // 600) * 600 AS win_start,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM m
              WHERE round(least(1.0, nt / 100.0) * 0.5
                          + (1.0 - punct_ratio) * 0.3
                          + least(1.0, avg_len / 8.0) * 0.2, 6) >= 0.5
            ),
            g AS (
              SELECT win_start, fp, min(doc_id) AS keep_id, count(*) AS dup_cnt
              FROM kept, mx
              WHERE win_start + 600 <= mx - 600
              GROUP BY win_start, fp
            )
            SELECT d.source, g.win_start,
                   count(*) AS n_admitted,
                   CAST(sum(g.dup_cnt) AS BIGINT) AS n_arrived,
                   CAST(sum(k.nt) AS BIGINT) AS n_tokens_admitted
            FROM g
            JOIN documents d ON g.keep_id = d.doc_id
            JOIN kept k ON g.keep_id = k.doc_id
            GROUP BY d.source, g.win_start
        """,
        "token_budget_cap": f"""
            WITH b AS (
              SELECT doc_id, source,
                     len(list_filter(string_split_regex(text, '[ ,."'']'),
                         x -> length(x) > 0))::BIGINT AS nt,
                     md5(doc_id::VARCHAR) AS pr
              FROM documents
            ),
            c AS (
              SELECT *, sum(nt) OVER (PARTITION BY source ORDER BY pr, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM b
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum((cum <= {pl.TOKEN_BUDGET_PER_SOURCE})::INT) AS BIGINT) AS n_kept,
                   CAST(sum(CASE WHEN cum <= {pl.TOKEN_BUDGET_PER_SOURCE} THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
                   CAST(sum(nt) AS BIGINT) AS tokens_arrived
            FROM c GROUP BY source
        """,
        "kmeans_step": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {sim.KMEANS_K}),
            p AS (
              SELECT e.vec_id, e.v, c.cid, c.cv,
                     list_sum(list_transform(range(1, len(e.v) + 1),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
              FROM e CROSS JOIN c
            ),
            a AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM p),
            asg AS (SELECT vec_id, v, cid, d2 FROM a WHERE rn = 1),
            d AS (SELECT cid, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM asg),
            m AS (SELECT cid, pos, avg(val) AS nv FROM d GROUP BY cid, pos),
            sh AS (
              SELECT m.cid, sqrt(sum((m.nv - c.cv[pos::INT]) * (m.nv - c.cv[pos::INT]))) AS shift
              FROM m JOIN c ON m.cid = c.cid GROUP BY m.cid
            ),
            st AS (SELECT cid, count(*) AS n, round(sum(d2), 4) AS inertia FROM asg GROUP BY cid)
            SELECT st.cid AS cluster, CAST(st.n AS BIGINT) AS n, st.inertia,
                   round(sh.shift, 6) AS centroid_shift
            FROM st JOIN sh ON st.cid = sh.cid
        """,
        "bloom_decontaminate": f"""
            WITH toks AS (
              SELECT doc_id, source,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, source, unnest(list_distinct(
                       list_transform(range(1, len(t) - {pl.NGRAM_N - 2}),
                           i -> array_to_string(t[i:i+{pl.NGRAM_N - 1}], ' ')))) AS g
              FROM toks
            ),
            benchg AS (SELECT DISTINCT g FROM grams WHERE doc_id % {pl.BENCH_MOD} = 0),
            bloom AS (
              SELECT DISTINCT unnest([
                {", ".join(f"('0x' || substr(md5('{j}' || g), 1, 8))::BIGINT % {pl.BLOOM_BITS}" for j in range(pl.BLOOM_K))}
              ]) AS bit
              FROM benchg
            ),
            train AS (SELECT * FROM grams WHERE doc_id % {pl.BENCH_MOD} <> 0),
            gh AS (
              SELECT doc_id, source, g,
                     ({" AND ".join(f"(('0x' || substr(md5('{j}' || g), 1, 8))::BIGINT % {pl.BLOOM_BITS}) IN (SELECT bit FROM bloom)" for j in range(pl.BLOOM_K))})::INT AS bloom_pos,
                     (g IN (SELECT g FROM benchg))::INT AS exact_pos
              FROM train
            ),
            pd AS (
              SELECT doc_id, source, max(bloom_pos) AS bf, max(exact_pos) AS ef
              FROM gh GROUP BY doc_id, source
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(bf) AS BIGINT) AS n_flagged_bloom,
                   CAST(sum(ef) AS BIGINT) AS n_flagged_exact,
                   CAST(sum(bf * (1 - ef)) AS BIGINT) AS n_false_pos
            FROM pd GROUP BY source
        """,
        "langid_eval": f"""
            WITH toks AS (
              SELECT lang,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            pred AS (
              SELECT lang,
                     CASE WHEN
                       len(list_filter(list_distinct(t),
                           x -> list_contains([{", ".join(repr(w) for w in ta.EN_STOPWORDS)}], x)))::DOUBLE
                         / greatest(len(list_distinct(t)), 1) >= 0.08
                     THEN 'en' ELSE 'other' END AS predicted_lang
              FROM toks
            ),
            cell AS (
              SELECT lang, predicted_lang, count(*) AS n_docs
              FROM pred GROUP BY lang, predicted_lang
            )
            SELECT lang, predicted_lang, CAST(n_docs AS BIGINT) AS n_docs,
                   round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang), 6)
                     AS share_of_lang
            FROM cell
        """,
        "quality_calibration": f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source,
                     round(least(1.0, len(t) / 100.0) * 0.5
                           + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                                    / greatest(length(text), 1)) * 0.3
                           + least(1.0,
                               (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                                / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q
              FROM toks
            ),
            r AS (
              SELECT doc_id, source, q,
                     row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS n
              FROM m
            )
            SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
                   round(avg(q), 6) AS mean_q,
                   {", ".join(f"max(CASE WHEN rn = greatest(1, ceil({p} * n)) THEN q END) AS p{int(p * 100)}" for p in pl.CALIB_PS)}
            FROM r GROUP BY source
        """,
        "dedup_rate_by_threshold": f"""
            {_SQL_TOKS},
            sh0 AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            sh AS (
              SELECT doc_id, shingle FROM sh0
              WHERE shingle IN (
                SELECT shingle FROM sh0 GROUP BY shingle
                HAVING count(*) <= {dd.HOT_SHINGLE_DF_CAP}
              )
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS jaccard
              FROM inter
              JOIN cnt ca ON da = ca.doc_id
              JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.1
            ),
            pt AS (
              SELECT unnest(list_filter([{", ".join(str(t) for t in dd.SWEEP_THRESHOLDS)}],
                                        th -> th <= jaccard)) AS threshold,
                     da, db
              FROM pairs
            ),
            per_t AS (SELECT threshold, count(*) AS n_pairs FROM pt GROUP BY threshold),
            docs_t AS (
              SELECT threshold, count(DISTINCT d) AS n_docs_involved
              FROM (SELECT threshold, unnest([da, db]) AS d FROM pt)
              GROUP BY threshold
            )
            SELECT round(threshold, 1) AS threshold,
                   CAST(n_pairs AS BIGINT) AS n_pairs,
                   CAST(n_docs_involved AS BIGINT) AS n_docs_involved
            FROM per_t JOIN docs_t USING (threshold)
        """,
        "semdedup_prune": f"""
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {sim.KMEANS_K}),
            p AS (
              SELECT e.vec_id, e.v, c.cid,
                     list_sum(list_transform(range(1, len(e.v) + 1),
                         i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS d2
              FROM e CROSS JOIN c
            ),
            a AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM p),
            asg AS (SELECT vec_id, v, cid AS cluster FROM a WHERE rn = 1),
            dup AS (
              SELECT DISTINCT x.cluster, x.vec_id
              FROM asg x JOIN asg y
                ON x.cluster = y.cluster AND y.vec_id < x.vec_id
              WHERE list_sum(list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i]))
                    / (sqrt(list_sum(list_transform(x.v, q -> q * q)))
                       * sqrt(list_sum(list_transform(y.v, q -> q * q))))
                    > {sim.SEMDEDUP_COS}
            )
            SELECT asg.cluster, count(*) AS n,
                   CAST(sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
                   CAST(count(*) - sum(CASE WHEN dup.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
            FROM asg LEFT JOIN dup
              ON asg.cluster = dup.cluster AND asg.vec_id = dup.vec_id
            GROUP BY asg.cluster
        """,
        "packing_efficiency": f"""
            WITH d AS (
              SELECT source, doc_id,
                     len(list_filter(string_split_regex(text, '[ ,."'']'),
                                     x -> length(x) > 0)) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS cum_excl
              FROM d
            ),
            pk AS (
              SELECT source, n_tokens,
                     cum_excl // {pl.PACK_LEN} AS pack_id,
                     cum_excl % {pl.PACK_LEN} AS pack_offset
              FROM c
            )
            SELECT source, count(*) AS n_docs,
                   CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(sum(n_tokens)::DOUBLE
                         / ((max(pack_id) + 1) * {pl.PACK_LEN}), 6) AS fill_rate,
                   CAST(sum((pack_offset + n_tokens > {pl.PACK_LEN})::INT) AS BIGINT) AS n_split_docs
            FROM pk GROUP BY source
        """,
        "hll_distinct_users": _HLL_ORACLE,
        "countmin_heavy_hitters": f"""
            {_SQL_TOKS},
            words AS (SELECT unnest(t) AS w FROM toks),
            sketch AS (
              SELECT j, ('0x' || substr(md5(j::VARCHAR || w), 1, 8))::BIGINT % {sk.CM_W} AS c,
                     count(*) AS n
              FROM words, unnest(range(0, {sk.CM_D})) AS u(j)
              GROUP BY 1, 2
            ),
            counts AS (SELECT w, count(*) AS exact_cnt FROM words GROUP BY w),
            top AS (
              SELECT w, exact_cnt FROM counts
              ORDER BY exact_cnt DESC, w ASC LIMIT {sk.CM_TOP_K}
            ),
            probes AS (
              SELECT w, exact_cnt, j,
                     ('0x' || substr(md5(j::VARCHAR || w), 1, 8))::BIGINT % {sk.CM_W} AS c
              FROM top, unnest(range(0, {sk.CM_D})) AS u(j)
            )
            SELECT p.w, CAST(max(p.exact_cnt) AS BIGINT) AS exact_cnt,
                   CAST(min(s.n) AS BIGINT) AS cm_estimate,
                   CAST(min(s.n) - max(p.exact_cnt) AS BIGINT) AS overestimate
            FROM probes p JOIN sketch s ON p.j = s.j AND p.c = s.c
            GROUP BY p.w
        """,
        "time_weighted_avg": """
            -- LOCF time-weighted average; integer epoch-us durations
            WITH ev AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
            ),
            d AS (
              SELECT user_id, value,
                     lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                       - ts_us AS dur
              FROM ev
            ),
            t AS (SELECT * FROM d WHERE dur IS NOT NULL)
            SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
                   round(sum(value * dur) / sum(dur)::DOUBLE, 6) AS twa_value,
                   round(avg(value), 6) AS naive_avg
            FROM t GROUP BY user_id
        """,
        "label_prop_step": """
            WITH e AS (
              SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            ),
            und AS (
              SELECT src, dst, w FROM e
              UNION ALL
              SELECT dst AS src, src AS dst, w FROM e
            ),
            cand AS (
              SELECT dst AS node, src AS lbl, sum(w) AS wsum
              FROM und GROUP BY 1, 2
            ),
            r AS (
              SELECT node, lbl, wsum,
                     row_number() OVER (PARTITION BY node
                                        ORDER BY wsum DESC, lbl ASC) AS rn
              FROM cand
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(lbl AS BIGINT) AS new_label,
                   CAST(wsum AS BIGINT) AS support
            FROM r WHERE rn = 1
        """,
        # the streaming twin shares the batch HLL oracle (same registers,
        # same estimator — the stream only changes WHERE the max-agg runs)
        "streaming_distinct_users_hll": _HLL_ORACLE,
        "quantile_sketch_quality": f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, '[ ,."'']'),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source,
                     round(least(1.0, len(t) / 100.0) * 0.5
                           + (1.0 - length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                                    / greatest(length(text), 1)) * 0.3
                           + least(1.0,
                               (coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                                / greatest(len(t), 1)) / 8.0) * 0.2, 6) AS q
              FROM toks
            ),
            binned AS (
              SELECT source, q,
                     least({sk.QSK_BINS - 1}, floor(q * {sk.QSK_BINS}))::INT AS b
              FROM m
            ),
            cells AS (SELECT source, b, count(*) AS cnt FROM binned GROUP BY 1, 2),
            cum AS (
              SELECT source, b, cnt,
                     sum(cnt) OVER (PARTITION BY source ORDER BY b
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(cnt) OVER (PARTITION BY source) AS n
              FROM cells
            ),
            sk_est AS (
              SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
                     max(CASE WHEN cum >= greatest(1, ceil(0.5 * n))
                               AND cum - cnt < greatest(1, ceil(0.5 * n))
                          THEN round((b + (greatest(1, ceil(0.5 * n)) - (cum - cnt))::DOUBLE / cnt)
                                     / {sk.QSK_BINS}, 6) END) AS p50_est,
                     max(CASE WHEN cum >= greatest(1, ceil(0.9 * n))
                               AND cum - cnt < greatest(1, ceil(0.9 * n))
                          THEN round((b + (greatest(1, ceil(0.9 * n)) - (cum - cnt))::DOUBLE / cnt)
                                     / {sk.QSK_BINS}, 6) END) AS p90_est
              FROM cum GROUP BY source
            ),
            r AS (
              SELECT source, q,
                     row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
                     count(*) OVER (PARTITION BY source) AS n
              FROM m
            ),
            ex AS (
              SELECT source,
                     max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN q END) AS p50_exact,
                     max(CASE WHEN rn = greatest(1, ceil(0.9 * n)) THEN q END) AS p90_exact
              FROM r GROUP BY source
            )
            SELECT s.source, s.n_docs, s.p50_est, ex.p50_exact, s.p90_est, ex.p90_exact,
                   round(abs(s.p50_est - ex.p50_exact), 6) AS err_p50,
                   round(abs(s.p90_est - ex.p90_exact), 6) AS err_p90
            FROM sk_est s JOIN ex ON s.source = ex.source
        """,
        "pagerank_nations": _pagerank_sql(),
        "fuzzy_blocked_join": """
            -- composite canopy block: (first token, length band of 4),
            -- mirroring operators/dedup.py fuzzy_blocked_join
            WITH names AS (SELECT DISTINCT p_name AS name FROM part)
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
            FROM names a JOIN names b
              ON string_split(a.name, ' ')[1] = string_split(b.name, ' ')[1]
             AND length(a.name) // 4 = length(b.name) // 4
             AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 3
        """,
        "embedding_stats": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT vec_id, CAST(len(v) AS BIGINT) AS dim,
                   round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
                   round(list_sum(v) / len(v), 6) AS mean_component
            FROM e
        """,
        "stats_aggregates": """
            SELECT l_returnflag,
                   round(stddev_samp(l_quantity), 6) AS sd_qty,
                   round(var_samp(l_quantity), 6) AS var_qty,
                   round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
                   round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "not_in_null_aware": """
            SELECT c_custkey, c_nationkey FROM customer
            WHERE c_nationkey NOT IN (
              SELECT s_nationkey FROM supplier WHERE s_acctbal < 0
            )
        """,
        "argmax_order": """
            SELECT o_custkey,
                   max(struct_pack(p := o_totalprice, k := o_orderkey)).k
                     AS best_orderkey,
                   round(max(struct_pack(p := o_totalprice, k := o_orderkey)).p, 2)
                     AS best_price
            FROM orders GROUP BY o_custkey
        """,
        "salted_join": """
            SELECT c_nationkey, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_nationkey
        """,
        # one SQL text, two engines: the oracle IS the implementation
        "sql_segment_spend": sqlapi.ANSI_SEGMENT_SPEND,
        "nested_roundtrip": """
            SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        """,
        "tpch_q2": f"""
            WITH {_SQL_PS},
            cost AS (
              SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
              FROM ps
              JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
                AND ps_partkey IN (
                  SELECT p_partkey FROM part
                  WHERE p_size = 15 AND p_type = 'SMALL'
                )
            )
            SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
                   ps_supplycost
            FROM cost c
            WHERE ps_supplycost = (
              SELECT min(ps_supplycost) FROM cost c2
              WHERE c2.ps_partkey = c.ps_partkey
            )
        """,
        "tpch_q11": f"""
            WITH {_SQL_PS},
            v AS (
              SELECT ps_partkey, round(sum(ps_supplycost * ps_availqty), 4) AS val
              FROM ps
              JOIN supplier ON ps_suppkey = s_suppkey
              WHERE s_nationkey = 5
              GROUP BY ps_partkey
            )
            SELECT ps_partkey, round(val, 2) AS val
            FROM v WHERE val > (SELECT sum(val) * 0.001 FROM v)
        """,
        "tpch_q20": f"""
            WITH {_SQL_PS},
            q96 AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty96
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2
            )
            SELECT s_suppkey, s_name FROM supplier
            WHERE s_nationkey = 2 AND s_suppkey IN (
              SELECT ps_suppkey FROM ps
              JOIN q96 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
              WHERE ps_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
              ) AND ps_availqty > 0.5 * qty96
            )
        """,
        "bag_except": """
            WITH r AS (
              SELECT o_custkey FROM orders
              EXCEPT ALL
              SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
            )
            SELECT o_custkey, count(*) AS cnt FROM r GROUP BY o_custkey
        """,
        "date_funcs": """
            SELECT o_orderkey,
                   epoch_us(date_trunc('month', o_orderdate)) AS month_us,
                   epoch_us(last_day(o_orderdate)::TIMESTAMP) AS eom_us,
                   isodow(o_orderdate) AS isodow,
                   epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us
            FROM orders
        """,
        "window_frames": """
            SELECT o_custkey, o_orderkey,
                   round(avg(o_totalprice) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ), 6) AS sliding_avg3,
                   cume_dist() OVER w AS cd,
                   nth_value(o_orderkey, 3) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS third_orderkey
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "join_full_outer": """
            WITH rich AS (SELECT * FROM customer WHERE c_acctbal > 2000),
            oa AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
            SELECT coalesce(c_custkey, o_custkey) AS custkey,
                   CAST(c_custkey IS NOT NULL AS BIGINT) AS has_customer,
                   coalesce(n_orders, 0) AS n_orders,
                   coalesce(round(c_acctbal, 2), -1.0) AS acctbal
            FROM rich FULL JOIN oa ON c_custkey = o_custkey
        """,
        "cross_join_grid": """
            WITH prios AS (SELECT DISTINCT o_orderpriority FROM orders),
            counts AS (SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1)
            SELECT p.o_orderpriority, r_name, coalesce(n, 0) AS n
            FROM prios p CROSS JOIN region
            LEFT JOIN counts c ON p.o_orderpriority = c.o_orderpriority
        """,
        "tpch_q18": """
            SELECT c_custkey, c_name, o_orderkey AS orderkey,
                   round(o_totalprice, 2) AS totalprice,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING sum(l_quantity) > 260
            )
            GROUP BY c_custkey, c_name, o_orderkey, round(o_totalprice, 2)
        """,
        "keep_best_dedup": f"""
            WITH kd AS (
              SELECT doc_id, n_chars, concat_ws(' ', t[1], t[2]) AS ck
              FROM (SELECT doc_id, n_chars,
                           list_filter(string_split_regex(text, {_D}),
                                       x -> length(x) > 0) AS t
                    FROM documents)
            )
            SELECT ck,
                   CAST(-(max(struct_pack(nc := n_chars, nid := -doc_id)).nid)
                        AS BIGINT) AS doc_id,
                   max(struct_pack(nc := n_chars, nid := -doc_id)).nc AS n_chars,
                   count(*) AS cluster_size
            FROM kd GROUP BY ck
        """,
        "decontamination": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            bench AS (SELECT DISTINCT g FROM flat WHERE doc_id % 20 = 0),
            hits AS (
              SELECT f.doc_id, count(*) AS n_hit
              FROM flat f JOIN bench b USING (g)
              WHERE f.doc_id % 20 <> 0 GROUP BY f.doc_id
            )
            SELECT g.doc_id, len(g.gs) AS n_doc_ngrams,
                   CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit_ngrams,
                   CAST(coalesce(h.n_hit, 0) > 0 AS BIGINT) AS contaminated
            FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
            WHERE g.doc_id % 20 <> 0
        """,
        "data_mixture": f"""
            WITH d AS (
              SELECT source, lang,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            )
            SELECT source, lang, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   round(sum(nt)::DOUBLE / (sum(sum(nt)) OVER ())::DOUBLE, 6)
                     AS token_share
            FROM d GROUP BY source, lang
        """,
        "mixture_weights": f"""
            WITH d AS (
              SELECT source, lang,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            ),
            agg AS (
              SELECT source, lang, count(*) AS n_docs,
                     CAST(sum(nt) AS BIGINT) AS n_tokens
              FROM d GROUP BY source, lang
            )
            SELECT source, lang, n_docs, n_tokens,
                   round(pow(n_tokens::DOUBLE, {pl.TEMPERATURE!r})
                         / (sum(pow(n_tokens::DOUBLE, {pl.TEMPERATURE!r})) OVER ()),
                         6) AS weight
            FROM agg
        """,
        "unigram_logprob_score": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            ex AS (SELECT doc_id, unnest(t) AS w FROM toks),
            freq AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
            tot AS (SELECT count(*)::DOUBLE AS n FROM ex)
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(c::DOUBLE / (SELECT n FROM tot))), 6)
                     AS avg_neglogprob
            FROM ex JOIN freq USING (w)
            GROUP BY doc_id
        """,
        "curation_pipeline": f"""
            {_curation_final_sql(sw)}
            SELECT source, count(*) AS n_docs_kept,
                   CAST(sum(nt) AS BIGINT) AS n_tokens_kept
            FROM final GROUP BY source
        """,
        "shard_manifest": f"""
            {_curation_final_sql(sw)},
            packed AS (
              SELECT source, doc_id, nt,
                     CAST(coalesce(sum(nt) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) // {pl.PACK_LEN} AS pack_id
              FROM final
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens,
                   count(DISTINCT pack_id) AS n_packs
            FROM packed GROUP BY source
        """,
        "repetition_filter": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(t)),
                         i -> t[i] || ' ' || t[i+1])) AS bg
              FROM toks
            ),
            f AS (SELECT doc_id, bg, count(*) AS c FROM g GROUP BY doc_id, bg),
            m AS (
              SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS tot,
                     count(*) AS n_distinct
              FROM f GROUP BY doc_id
            )
            SELECT doc_id, tot AS n_bigrams,
                   round(mx::DOUBLE / tot::DOUBLE, 6) AS top_bigram_frac,
                   round(1.0 - n_distinct::DOUBLE / tot::DOUBLE, 6)
                     AS dup_bigram_frac,
                   CAST(mx::DOUBLE / tot::DOUBLE > 0.10 AS BIGINT) AS flagged
            FROM m
        """,
        "pack_sequences": f"""
            WITH d AS (
              SELECT source, doc_id,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT source, doc_id, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS cum_excl
              FROM d
            )
            SELECT source, doc_id, n_tokens,
                   cum_excl // 2048 AS pack_id,
                   cum_excl % 2048 AS pack_offset
            FROM c
        """,
        "split_assign": f"""
            WITH d AS (
              SELECT CASE WHEN substr(md5(doc_id::VARCHAR), 1, 1) < 'c'
                            THEN 'train'
                          WHEN substr(md5(doc_id::VARCHAR), 1, 1) < 'e'
                            THEN 'val'
                          ELSE 'test' END AS split,
                     len(list_filter(string_split_regex(text, {_D}),
                                     x -> length(x) > 0)) AS nt
              FROM documents
            )
            SELECT split, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM d GROUP BY split
        """,
        "source_overlap": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            pairs AS (
              SELECT da, db, i::DOUBLE / (ca.n + cb.n - i) AS j
              FROM inter
              JOIN cnt ca ON da = ca.doc_id JOIN cnt cb ON db = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            )
            SELECT least(x.source, y.source) AS source_a,
                   greatest(x.source, y.source) AS source_b,
                   count(*) AS n_pairs, round(avg(j), 6) AS avg_jaccard
            FROM pairs
            JOIN documents x ON da = x.doc_id
            JOIN documents y ON db = y.doc_id
            GROUP BY 1, 2
        """,
        "incremental_dedup": f"""
            {_SQL_TOKS},
            sh AS (
              SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
              FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
            ),
            cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS bd, b.doc_id AS cd, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle
              WHERE a.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
                AND b.doc_id % {dd.BATCH_MOD} < {dd.BATCH_THRESHOLD}
              GROUP BY 1, 2
            ),
            near AS (
              SELECT DISTINCT bd FROM inter
              JOIN cnt ca ON bd = ca.doc_id JOIN cnt cb ON cd = cb.doc_id
              WHERE i::DOUBLE / (ca.n + cb.n - i) >= 0.5
            ),
            sp AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(t) - {dd.SPAN_WIDTH - 2}, {dd.SPAN_STRIDE}),
                       i -> md5(array_to_string(t[i : i + {dd.SPAN_WIDTH - 1}], ' '))
                     )) AS hs
              FROM toks WHERE len(t) >= {dd.SPAN_WIDTH}
            ),
            ex AS (SELECT doc_id, unnest(hs) AS h FROM sp),
            spand AS (
              SELECT DISTINCT a.doc_id FROM ex a
              WHERE a.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
                AND EXISTS (
                  SELECT 1 FROM ex b
                  WHERE b.h = a.h
                    AND b.doc_id % {dd.BATCH_MOD} < {dd.BATCH_THRESHOLD}
                )
            )
            SELECT d.doc_id,
                   (d.doc_id IN (SELECT bd FROM near))::INT AS near_dup,
                   (d.doc_id IN (SELECT doc_id FROM spand))::INT AS span_dup
            FROM documents d
            WHERE d.doc_id % {dd.BATCH_MOD} >= {dd.BATCH_THRESHOLD}
        """,
        "word_pmi": f"""
            {_SQL_TOKS},
            pos AS (
              SELECT doc_id, i, t[i] AS w
              FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
            ),
            ev AS (
              SELECT least(a.w, b.w) AS wa, greatest(a.w, b.w) AS wb
              FROM pos a JOIN pos b
                ON a.doc_id = b.doc_id
               AND b.i > a.i AND b.i <= a.i + {ta.COOC_WINDOW}
            ),
            pc AS (
              SELECT wa, wb, count(*) AS n_cooc FROM ev GROUP BY 1, 2
              HAVING count(*) >= {ta.PMI_MIN_COUNT}
            ),
            uni AS (SELECT w, count(*) AS c FROM pos GROUP BY w),
            tot AS (
              SELECT (SELECT count(*) FROM ev)::DOUBLE AS P,
                     (SELECT count(*) FROM pos)::DOUBLE AS T
            )
            SELECT wa AS word_a, wb AS word_b, n_cooc,
                   round(ln((n_cooc::DOUBLE / P)
                            / ((ua.c::DOUBLE / T) * (ub.c::DOUBLE / T))), 6)
                     AS pmi
            FROM pc JOIN uni ua ON wa = ua.w JOIN uni ub ON wb = ub.w, tot
        """,
        "event_transitions": """
            WITH ev AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
              FROM events
            ),
            steps AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                     ) AS to_type
              FROM ev
            ),
            mat AS (
              SELECT from_type, to_type, count(*) AS n
              FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT from_type, to_type, n,
                   n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE
                     AS prob
            FROM mat
        """,
        "trade_flows_2hop": """
            WITH edges AS (
              SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY 1, 2
            )
            SELECT a.src AS src, b.dst AS dst,
                   CAST(sum(a.w * b.w) AS BIGINT) AS flow2
            FROM edges a JOIN edges b ON a.dst = b.src
            GROUP BY 1, 2
        """,
        "grep_mr": """
            SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'fast join')
        """,
        # the collecting-reduce parity query shares inverted_index's oracle
        "inverted_index_mr": f"""
            {_SQL_PAIRS}
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS n_docs
            FROM pairs GROUP BY word
        """,
        "contamination_report": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(t) - 3),
                         i -> array_to_string(t[i:i+4], ' '))) AS gs
              FROM toks
            ),
            bex AS (
              SELECT doc_id AS bench_id, unnest(gs) AS g FROM grams
              WHERE doc_id % {pl.BENCH_MOD} = 0
            ),
            tex AS (
              SELECT doc_id AS train_id, unnest(gs) AS g FROM grams
              WHERE doc_id % {pl.BENCH_MOD} <> 0
            ),
            h AS (
              SELECT bench_id,
                     count(DISTINCT train_id) AS n_leaking_docs,
                     count(DISTINCT g) AS n_compromised_ngrams
              FROM bex JOIN tex USING (g) GROUP BY bench_id
            )
            SELECT g.doc_id AS bench_id, CAST(len(g.gs) AS BIGINT) AS n_ngrams,
                   CAST(coalesce(h.n_leaking_docs, 0) AS BIGINT)
                     AS n_leaking_docs,
                   CAST(coalesce(h.n_compromised_ngrams, 0) AS BIGINT)
                     AS n_compromised_ngrams
            FROM grams g LEFT JOIN h ON g.doc_id = h.bench_id
            WHERE g.doc_id % {pl.BENCH_MOD} = 0
        """,
        "streaming_active_users": """
            WITH a AS (
              SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
              FROM events
            )
            SELECT epoch_us(h) AS hour_us, count(*) AS n_users
            FROM a GROUP BY 1
        """,
        "zipf_slope": f"""
            {_SQL_PAIRS},
            freq AS (SELECT word AS w, count(*) AS c FROM pairs GROUP BY word),
            ranked AS (
              SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk
              FROM freq
            )
            SELECT count(*) AS n_vocab,
                   round(regr_slope(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6) AS slope,
                   round(regr_intercept(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6)
                     AS intercept,
                   round(regr_r2(ln(c::DOUBLE), ln(rnk::DOUBLE)), 6) AS r2
            FROM ranked
        """,
        "bigram_logprob_score": f"""
            {_SQL_TOKS},
            t2 AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
            ev AS (
              SELECT doc_id, t[i] AS p, t[i + 1] AS w
              FROM t2, unnest(range(1, len(t))) AS u(i)
            ),
            big AS (SELECT p, w, count(*) AS cb FROM ev GROUP BY 1, 2),
            ctx AS (SELECT p, CAST(sum(cb) AS BIGINT) AS cp FROM big GROUP BY 1),
            ex AS (SELECT unnest(t) AS w FROM t2),
            uni AS (SELECT w, count(*) AS cu FROM ex GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n FROM ex)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(-ln({pl.BIGRAM_LAMBDA!r} * (cb::DOUBLE / cp::DOUBLE)
                             + {1.0 - pl.BIGRAM_LAMBDA!r}
                               * (cu::DOUBLE / (SELECT n FROM tot)))), 6)
                     AS avg_neglogprob
            FROM ev JOIN big USING (p, w) JOIN ctx USING (p) JOIN uni USING (w)
            GROUP BY doc_id
        """,
        # session_window semantics: break on gap >= 30 min (strict
        # in-window merge), see streaming/event_stream.streaming_sessions
        "streaming_sessions": """
            WITH e AS (
              SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                  >= 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT user_id, value, ts_us,
                     CAST(sum(brk) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS sid
              FROM e
            )
            SELECT user_id, min(ts_us) AS session_start_us,
                   count(*) AS n_events,
                   round(sum(value), 2) AS session_value
            FROM s GROUP BY user_id, sid
        """,
        "streaming_enriched_revenue": """
            SELECT c_nationkey, count(*) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_nationkey
        """,
        "weighted_sample": f"""
            {_SQL_TOKS},
            t2 AS (
              SELECT doc_id, source,
                     greatest(len(t), 1)::DOUBLE AS w
              FROM toks JOIN documents USING (doc_id)
            ),
            k AS (
              SELECT source, doc_id,
                     pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                          + 1.0) / 4294967296.0, 1.0 / w) AS ky
              FROM t2
            )
            SELECT source, doc_id, rank FROM (
              SELECT source, doc_id,
                     row_number() OVER (
                       PARTITION BY source ORDER BY ky DESC, doc_id ASC
                     ) AS rank
              FROM k
            ) WHERE rank <= {pl.WEIGHTED_SAMPLE_K}
        """,
        "streaming_curated_ingest": f"""
            WITH toks AS (
              SELECT doc_id, source, text,
                     list_filter(string_split_regex(text, {_D}),
                                 x -> length(x) > 0) AS t
              FROM documents
            ),
            m AS (
              SELECT doc_id, source, text, len(t) AS nt,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            ),
            kept AS (
              SELECT doc_id, nt,
                     md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
              FROM m
              WHERE round(least(1.0, nt / 100.0) * 0.5
                          + (1.0 - punct_ratio) * 0.3
                          + least(1.0, avg_len / 8.0) * 0.2, 6) >= 0.5
            ),
            g AS (
              SELECT fp, min(doc_id) AS keep_id, count(*) AS dup_cnt
              FROM kept GROUP BY fp
            )
            SELECT d.source,
                   count(*) AS n_admitted,
                   CAST(sum(g.dup_cnt) AS BIGINT) AS n_arrived,
                   CAST(sum(k.nt) AS BIGINT) AS n_tokens_admitted
            FROM g
            JOIN documents d ON g.keep_id = d.doc_id
            JOIN kept k ON g.keep_id = k.doc_id
            GROUP BY d.source
        """,
        "lang_entropy": """
            WITH cell AS (
              SELECT source, lang, count(*) AS n
              FROM documents GROUP BY source, lang
            ),
            probs AS (
              SELECT source, lang, n,
                     n::DOUBLE / (sum(n) OVER (PARTITION BY source))::DOUBLE
                       AS p
              FROM cell
            )
            SELECT source,
                   count(*) AS n_langs,
                   CAST(sum(n) AS BIGINT) AS n_docs,
                   round(-sum(p * ln(p)), 6) AS entropy,
                   round(exp(-sum(p * ln(p))), 6) AS effective_langs,
                   max(struct_pack(n := n, lang := lang)).lang
                     AS majority_lang
            FROM probs GROUP BY source
        """,
        "embedding_outliers": """
            WITH e AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
            ),
            ex AS (
              SELECT label, i AS pos, v[i] AS x
              FROM e, unnest(range(1, len(v) + 1)) AS u(i)
            ),
            cent AS (SELECT label, pos, avg(x) AS c FROM ex GROUP BY 1, 2),
            cv AS (
              SELECT label, list(c ORDER BY pos) AS cvec FROM cent GROUP BY label
            )
            SELECT vec_id, label,
                   round(list_cosine_similarity(v, cvec), 6) AS cos_centroid
            FROM e JOIN cv USING (label)
        """,
    }

