"""Regenerate PLANS.md: formatted physical plans for the headline
queries at sf0.01, annotated with the invariants each plan shows
(pushed filters, pruned read schemas, broadcast joins, codegen spans).

Run: python scripts/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

NOTES = {
    "word_count": "only `text` in ReadSchema (column pruning); partial_count before the exchange (map-side combine)",
    "key_stats": "PushedFilters on the scan; single exchange; partial+final hash-agg",
    "join_revenue_by_nation": "dims arrive via BroadcastExchange/BroadcastHashJoin — the fact table never shuffles for them",
    "tpch_q1": "date filter pushed to the parquet scan; 8 measures in one hash-agg pass",
    "tpch_q3": "broadcast dims + one shuffle per fact join key; AQE re-plans at runtime",
    "tf_idf": "df(w) re-aggregates the tf table (second shuffle moves |distinct pairs|, not |tokens|); both aggs partial+final",
    "grouping_sets_pricing": "one Expand + one shuffle for all three grouping sets — n sets cost one scan",
    "cosine_topk": "query vectors broadcast (BroadcastNestedLoopJoin BuildRight); corpus streamed once; WindowGroupLimit prunes per-partition before the exchange",
    "minhash_lsh_neardup": "candidate generation (signature agg + SHUFFLE_HASH band self-join on (band, bucket) — bands are corpus-linear, never broadcast; plan pinned on _band_candidates in test_scale_fixes.py) is eagerly checkpointed, so THIS final plan starts from candidate-sized scans: every verify join is bounded by the near-dup pair population, and the unhinted joins let AQE broadcast at runtime from measured sizes",
    "simhash": "one tokenize + explode, 64 algebraic partial sums map-side, one shuffle of (doc_id, 64 longs) — no HOF lambdas, full codegen",
    "fuzzy_blocked_join": "self-join shuffles on the composite (first token, length band) canopy key; block cardinality grows with the vocabulary so per-block pair counts stay bounded",
    "tpch_q8": "eight-way star join: every dimension rides a BroadcastExchange; no shuffle until the final 1-row-per-year agg",
    "tpch_q21": "double-correlated EXISTS/NOT EXISTS as left-semi + left-anti over distinct (orderkey, suppkey) projections — the narrowest possible shuffles",
    "gap_fill": "sequence+explode grid bounded per user; last(ignorenulls) window shares the user-key exchange with the left join",
    "salted_join": "ShuffledHashJoin on (custkey, salt): the hot fact key is split across 8 buckets; the replicated dim side is 8x small-table rows",
    "argmax_order": "single hash agg, no Window/Sort: struct-max carries (price, key) through map-side partials",
    "tpch_q2": "derived partsupp + correlated-MIN decorrelated to a broadcast per-part min; the 5-part semi join prunes ps before any dim join",
    "keep_best_dedup": "canopy argmax as ONE hash-agg exchange: struct-max (n_chars, -doc_id) partials map-side; no Window/Sort anywhere",
    "decontamination": "benchmark n-gram set rides a BroadcastExchange (absolutely small: an eval suite); the corpus side is scanned once, array_distinct before the explode keeps per-doc dedup map-side",
    "pack_sequences": "one source-keyed exchange feeds the running-sum Window; pack arithmetic is projection-only after it",
    "unigram_logprob_score": "vocab-sized freq agg, tokens↔vocab key join (AQE picks the side at runtime), 1-row total broadcast, per-doc algebraic agg — no cartesian anywhere",
    "curation_pipeline": "every signal branch is doc_id-keyed; the benchmark n-gram set is the single broadcast; dedup is a fingerprint-keyed hash-agg argmin, no window over raw docs",
    "triangle_count": "degree-ordered orientation: each edge points from its (degree, id)-smaller endpoint, so wedge fan-out is bounded by max out-degree ~ sqrt(|E|) (the id-ordered form blows up O(deg²) on hubs); wedge + both-orientation closure joins, no nested-loop; corner explode feeds one hash agg",
    "incremental_dedup": "exact branch below NEARDUP_EXACT_MAX_BYTES (shown here): one-sided batch×corpus shingle join (SHUFFLE_HASH) + jaccard verify, structurally mirroring the oracle; the span semi-join is pinned SHUFFLE_HASH in test_scale_fixes.py so the corpus-linear span set never broadcasts; past the byte threshold the one-sided LSH band join takes over (plan pinned component-wise)",
    "ngram_jaccard_neardup": "exact branch below NEARDUP_EXACT_MAX_BYTES (shown here): df-capped shingle self-join stays a ShuffledHashJoin (pair join pinned non-broadcast in test_plans.py); past the byte threshold candidates come from the LSH band path with the documented recall S-curve",
    "bigram_logprob_score": "bigram events from one map-side zip_with (no positions self-join); three vocab-keyed hash aggs; model joins are key joins (AQE picks sides at runtime — a 100 TB bigram vocab is never broadcast); the single BroadcastNestedLoopJoin is the 1-row total",
    "embedding_outliers": "posexplode + (label,pos) algebraic agg with map-side partials; the |labels|-row centroid table rides a BroadcastExchange back onto the corpus so embedding bytes never shuffle for the join",
    "zipf_slope": "corpus touched once (explode + vocab-sized freq agg, then the ranked vocab is persisted for its two consumers); TWO-PASS distributed rank — range partition on (freq desc, word), local row_number, ~8-row offset table broadcast back — never a global single-partition window over a possibly-billion-term vocabulary; regr_* are sum-decomposable aggs with map-side partials",
    "word_pmi": "pair events generated map-side by a nested array transform (no positions self-join); two algebraic hash-aggs + two key joins; the 1-row totals table is the only planned broadcast — totals re-aggregate the agg tables, persisted behind the size-aware switch so a corpus-scale input is scanned exactly twice",
    "source_overlap": "exact branch below NEARDUP_EXACT_MAX_BYTES (shown here): uncapped shingle self-join pairs, then the (doc_id, source) lookup joins and one hash-agg on the canonicalized source pair; past the byte threshold the pair table comes from the checkpointed LSH path and AQE broadcasts it at runtime",
    "simhash_neardup": "block-bucket self-join on (blk, val) pinned SHUFFLE_HASH (blocks are 4 rows/doc, corpus-linear — never broadcast); bit_count(xor) verify stays in codegen; pigeonhole-exact for Hamming <= 3, equivalence pinned in test_scale_fixes.py",
    "weighted_sample": "A-ES key (md5 -> conv -> pow) computed in one codegen projection; per-source top-K via WindowGroupLimit, so the single exchange moves ~K rows per (partition, source), never the corpus",
    "lang_entropy": "per-(source, lang) algebraic partials map-side; entropy, exp-entropy, and the struct-max majority pick all run over the aggregated |sources| x |langs| frame — nothing corpus-sized moves twice",
    "cdc_dup_chunks": "content-defined boundaries via the Rabin-Karp polynomial window hash (8 multiply-adds per position over a once-projected codepoint array — the md5-per-position constant is gone, 106x on the isolated scan) + chunk assembly, all per-row array expressions; then the dup_spans plan — one chunk-hash count agg (map-side partials absorb hot boilerplate chunks) + ONE keyed join back, never a chunk self-join",
    "kmeans_step": "K seed centroids ride ONE BroadcastExchange into the vector scan; assignment is an algebraic min(struct(d2,cid)) hash-agg; a single (cluster,pos) agg (d2 carried on the posexplode) yields counts + inertia + recomputed means; no sort-merge or cartesian join anywhere (test-pinned)",
    "bloom_decontaminate": "the bloom bit-set (distinct int positions of benchmark grams) and the exact benchmark gram set each ride a BroadcastExchange; the corpus side is scanned once for grams, probes are int-keyed joins (the gram-string shuffle of the exact path disappears), and all flags reduce through algebraic aggs",
    "token_budget_cap": "ONE exchange total: the source-partitioned window cumsum; the per-source admission report reuses the same partitioning for its final agg",
    "quality_calibration": "quality computed in one codegen projection; rank window partitioned by source; the per-source counts table rides a BroadcastExchange back; nearest-rank picks are conditional-max aggregates, not sorts",
    "langid_eval": "one corpus pass computes the prediction expression inline (no join with language_id); the confusion agg and its share window run over the (|langs| x 2)-row aggregate",
    "dedup_rate_by_threshold": "ONE pair pass (the exact/LSH size switch as everywhere) with a single consumer: thresholds explode map-side (<= 8 rows per pair), endpoints explode to 2 rows, and one agg yields both the pair count (count/2) and the distinct-doc count per threshold",
    "semdedup_prune": "within-cluster pair join SALTED on (cluster, ia % 8) with the b side replicated — and both sides arrive via an EXPLICIT-width repartition (REPARTITION_BY_NUM): the pair stream is tiny in bytes but quadratic in compute, so AQE's size-based coalescing would otherwise fold the whole cosine workload onto one task (measured 4.3 s -> 1.7 s at sf0.1)",
    "packing_efficiency": "rides pack_sequences' single source-window cumsum; the per-source rollup reuses the window's partitioning — one exchange in the entire plan",
    "hll_distinct_users": "register build is ONE algebraic max-agg over (event_type, bucket) — fixed 1024-registers-per-type state with map-side partials; ranks are integer-exact (39 - length(bin)), no float log; the estimator runs over the register aggregate only",
    "countmin_heavy_hitters": "cell sums are one algebraic agg of a 4-structs-per-token map-side explode; the fixed-size 4096-cell sketch rides a BroadcastExchange to the candidate probes; estimate = min over rows",
    "time_weighted_avg": "one user-keyed lead window; the per-user agg reuses the window's partitioning — single exchange; durations are integer epoch-us until the final ratio",
    "label_prop_step": "symmetrize via union (map-side), then two algebraic hash-aggs: (node, label) weight sums and the max(struct(w, -label)) argmax-with-tiebreak — no window over the adjacency",
    "quantile_sketch_quality": "the histogram cells are ONE algebraic count agg (no per-source sort of raw docs); the cumulative walk + interpolation run over the |sources| x 100 cell table; the exact nearest-rank audit branch is the only rank window and exists to measure the sketch",
    "dup_spans": "span hashes deduped per doc map-side (array_distinct before the explode); one algebraic count agg keyed on span hash + one keyed join back — hot corpus-wide boilerplate spans are absorbed by map-side partials, and the join fans out per occurrence, never per pair",
    "embedding_neardup_strict": "the production near-dup regime: 16 bucket ids materialized ONCE per vector via the ArrowEvalPython matmul projection (one numpy matmul per Arrow batch — the HOF-fold form cost 6.5-9 s in interpretation for the same 16M flops; bit-identical, test-pinned), ONE (tbl, bucket) key per table per vector (no probe ball — candidate volume is occupancy-bounded and linear), explicit-width repartition on both sides of the bucket self-join (REPARTITION_BY_NUM, the AQE bytes-vs-compute pin), exact-cosine verify in codegen; no NLJ/cartesian (test-pinned)",
    "bucketed_join_revenue": "both scans show Bucketed: true / SelectedBucketsCount: 8 out of 8 and feed the SortMergeJoin with NO exchange — the bucket layout written at ingest replaces the per-query fact-fact shuffle; the single Exchange in the plan is the final 5-row per-priority agg (test-pinned)",
    "label_prop_iterate": "final-iteration plan starts from the localCheckpoint'd node-sized label table (lineage truncated each round — the RDD scan at the leaves), one src-keyed edge join + the two algebraic label_prop_step aggs; curve scalars are 1-row aggregates",
    "hll_union_types": "the ALL row is a max(r) agg over the per-type REGISTER table (|types| x 1024 rows), not a rescan of events — the plan shows the union sketch derived from the same single register build the per-type rows use",
    "orc_roundtrip": "the read-back side is a pure ORC scan with ReadSchema pruned to (doc_id, n_tokens, pack_id) + the source partition column — text is never re-read; partition discovery and pruning behave exactly as the parquet shard path",
    "prefix_filter_neardup": "df agg + ONE doc-keyed sort_array agg produce the rarest-first prefixes (sizes and the prefix slice are projections over the same agg — the former window + sizes agg + join cost two extra doc-keyed shuffles); the candidate self-join keys on the prefix shingle only (~(1-t) of each set), then a pair-keyed intersection count agg and two size joins — every join keyed, the uncapped exact result with no all-pairs stage",
    "ppjoin_neardup": "same prefix frame, but candidates pass the LENGTH filter per matched prefix row (pruned pairs never form a group) and the POSITIONAL upper bound as one algebraic (da,db,na,nb) agg before the intersection-count verify — strictly fewer candidates than the VCL join feed the expensive stage (pytest-pinned), with zero recall loss (same uncapped oracle)",
    "pagerank_docs": "pair generation (the prefix-filter plan above) runs once and is eagerly checkpointed; the final-iteration plan starts from the checkpointed |V|-row rank vector — one src-keyed join against the checkpointed transition table + one dst agg per round, nothing pair-generation-sized recomputes per iteration",
    "runtime_filter_join": "at test SF the plan is the plain gated join (the runtime bloom filter needs >= ~10 GB scanned on the application side — tests pin the injected bloom_filter_agg/might_contain form with the gates lowered); what THIS snapshot shows is the baseline the filter improves on: the full lineitem scan feeding the join shuffle",
    "compaction_roundtrip": "the accounting side is a pure parquet scan of the COMPACTED files with ReadSchema pruned to (doc_id, source, version) + length(text) — the merge-on-read union + argmax-struct + tombstone filter happened at write time, so readers of the compacted table pay none of it",
    "dedup_clusters": "edges from the checkpointed near-dup candidate path, then min-label propagation with persist-before-count and pointer jumping; snapshot exists so the recurring min-drift watch item can be adjudicated by plan diff (the tpch_q8/minhash protocol) instead of from totals",
    "hll_intersect_types": "ONE register build feeds both the single-type estimates and the pair-merged union registers; every join downstream of the build touches 1024-row register tables only — the events table is scanned for registers and the exact audit, never per pair",
    "kmv_intersect_types": "per-type sketches via WindowGroupLimit top-K over the 48-bit hash (the exchange moves ~K rows per partition-type, never the corpus); union/flag joins touch K-row sketch tables only; the events table is scanned for the sketch build and the exact audit",
    "length_ks_by_source": "two algebraic count aggs (global and per-source length histograms, map-side partials); the KS walk runs over the sources x lengths grid — a small cross join of aggregates — with per-source cumulative windows; the corpus is scanned once and nothing corpus-sized is shuffled twice",
    "streaming_quantile_quality": "the batch-side finish over the materialized |sources| x 100 cell table (complete mode); the streaming half is the same qsk_cells algebraic count agg running against the state store",
    "streaming_custom_sessions": "the batch-side view of the materialized update-mode sink; the streaming half is FlatMapGroupsInPandasWithState keyed on user_id — Arrow batches in, fixed-size GroupState per user, no shuffle beyond the keyed state partitioning",
    "streaming_heavy_hitters": "the streaming half materializes the 4096-cell sketch from the state store (complete mode); THIS batch-side plan probes it broadcast against the exact top-K candidates — identical to the batch countmin plan from the sketch onward",
    "cluster_diameter": "final plan starts from the localCheckpoint'd per-cluster frontier of the last min-plus BFS round (lineage truncated per round); cluster stats are three algebraic aggs over the pair/membership tables — the pair graph is cluster-bounded, never corpus-wide",
    "cc_star": "alternating large-star/small-star rounds, each ONE (node-keyed agg + edge rewrite) exchange; the Σ(min-endpoint) fixpoint probe is a 1-row agg; final plan reads the localCheckpoint'd label table — diameter-independent round count vs dedup_clusters' propagation",
    "zorder_layout": "the read-back side: a pure parquet scan of the Z-laid files with ReadSchema pruned to (ship_day, partkey) + the zb partition column, one partition-local min/max agg — the Morton arithmetic and the one repartition-by-range shuffle happened at write time",
    "skew_profile": "one algebraic per-key count agg per profiled key is the only corpus contact (reads just the key column); reducer modeling and the summary cross-joins run over per-KEY tables with 1-row broadcast joins",
    "kcore_peel": "final-round plan starts from the localCheckpoint'd surviving edge set; per round one degree hash-agg over the symmetrized endpoint union + two left-semi joins — the co-purchase self-join (order-keyed, basket-bounded fan-out) runs once before round 1",
    "range_partition_plan": "ONE per-day count agg is the only corpus pass (ReadSchema = l_shipdate alone); the cumulative Window is deliberately unpartitioned — it runs over the calendar-bounded distinct-day table, and the 1-row total arrives via BroadcastExchange",
    "ewma_anomaly": "single user_id exchange feeding one Window; the trailing-list folds (reduce over <= 8-element arrays) are codegen projections, and every filter after the window is row-local — the sessionize single-shuffle profile with bounded per-row state",
    "kl_source_divergence": "one explode feeds both vocab-sized aggs; the divergence join is keyed on the token (vocab never broadcast), the 1-row corpus total is the only BroadcastExchange, and the final agg is per-source algebraic",
    "streaming_dedup_ingest": "the batch-side finish: per-type count of the materialized surviving keys joined to the raw counts; the streaming half is dropDuplicatesWithinWatermark — key-partitioned state with watermark eviction, no aggregation state besides the key set",
    "containment_neardup": "contained-side prefix candidates: the shared rarest-first prefix frame joins the FULL shingle stream on the shingle key (no position constraint exists on the containing side), then the array-intersect verify moves only candidate docs' lists — no all-pairs stage, fan-out bounded by the prefix shingles' document frequency",
    "source_signature": "the kl_source_divergence aggregation skeleton (explode once, two vocab-sized aggs, token-keyed join, 1-row broadcast total); the rank window partitions by source over the support-filtered candidate table — most of the vocabulary (hapax mass) never reaches it",
    "ohlc_bars": "ONE hash agg on (event_type, bucket) computes all five bar measures — open/close are struct-min/max partials merging map-side (no Window, no Sort over raw events); ReadSchema pruned to (ts, event_type, event_id, value)",
    "scd2_intervals": "one user_id Exchange REUSED by the lag window, the running-sum window, and the final run agg (the plan shows a single shuffle); within-partition sorts are the only per-window cost",
    "market_basket_rules": "distinct (order, part) projection feeds the order-keyed pair self-join (basket-bounded fan-out); per-part counts join on the part key and the 1-row order total is the only BroadcastExchange",
    "interval_concurrency": "the boundary table (2 rows per user-type) is what the running-sum window sees — the plan's only corpus contact is the (type, user) interval agg; peak pick is an algebraic min_by over per-type boundaries",
    "mad_outliers": "two type-keyed median aggs (sort within the 5 groups) and the 5-row stats table broadcast back onto the stream — the event scan is touched twice for medians, once for the screen, never shuffled on a non-key",
    "event_trigrams": "both lead() windows share ONE user_id exchange (plan shows a single shuffle + one sort); the trigram agg output is bounded by |types|^3",
    "clustering_coeff": "degree-ordered orientation (wedges at the lowest-degree corner, fan-out ~sqrt(|E|)) then the wedge + closing joins all keyed on edge endpoints; the coefficient join is degree-table-sized",
    "neyman_allocation": "ONE source-keyed algebraic agg (n, Σx, Σx²) is the only corpus pass; allocation math and the remainder window run over the |sources|-row frame with 1-row broadcast totals",
    "oov_rate": "token-keyed count agg → K-row vocab via WindowGroupLimit-capped rank → BroadcastExchange classifying the token stream → source-keyed agg; the token table shuffles once (for the vocab count), the classify join is broadcast",
    "evolution_roundtrip": "the read-back side: a merged-schema parquet scan (both batch dirs, old files surfacing hi_quality as NULL) pruned to 4 columns + one source-keyed agg — the two writes happened before this plan",
    "dq_referential_audit": "snapshot shows the createDataFrame literal of the collected check counts; the real work is the component anti-joins/aggs, each a keyed exchange — counts-not-rows keeps every action scalar-sized (the kcore driver-action pattern)",
    "streaming_ohlc": "the batch-side read of the complete-mode sink; the streaming half is the SAME algebraic struct-min/max agg as ohlc_bars running against the state store — one fixed-size row per (type, window), partials merging across micro-batches exactly like map-side combine",
    "sssp_parts": "final-round plan starts from the localCheckpoint'd |V|-row distance vector; per round one dist⋈edges join keyed on the relaxed endpoint + one node-keyed min agg — the pagerank rank-vector shuffle profile with integer distances",
    "array_funcs_catalog": "pure per-row projection inside one WholeStageCodegen span — no Exchange anywhere in the plan; ReadSchema pruned to (doc_id, text)",
    "null_safe_join": "both joins broadcast the 3-row derived dim; the <=> join shows the null-safe EqualNullSafe condition where the plain join shows EqualTo — the semantic pin is the point, the physical plan is two broadcast probes",
    "ivm_source_stats": "the maintenance read: base aggregate arrives as a parquet scan of the MATERIALIZED view (4 pruned columns), the delta is a delta-sized agg, and the merge is one |sources|-row groupBy — the base corpus appears nowhere in this plan, which is the IVM contract made visible",
    "ann_lsh": "corpus emits 8 keys/vector, the 50-query multiprobe side (5 keys/table) rides a BroadcastExchange into the bucket join; candidate dedup + exact-cosine verify + WindowGroupLimit top-5 all bounded by bucket collisions, never corpus²",
    "ann_ivf": "final assignment scan (broadcast centroids, min_by argmin — no window sort over the corpus×k pairs), nprobe probe selection on the |q|×k frame, and the per-cluster candidate join keyed on cid — each query touches ~nprobe/k of the corpus by construction",
    "audio_energy": "ONE mapInPandas pass (ArrowEvalPython in-plan): WAV header parse + rate-derived hop windows vectorized per Arrow batch (r12 — window geometry from the PARSED fmt rate, PCM sliced at the parsed data offset), rows out ~|samples|/hop per doc — no shuffle anywhere, media bytes never leave the scan partition",
    "wav_header_stats": "scan → JVM hex/unhex header synthesis (codegen, no Python near the payload) → ONE mapInPandas chunk-scan parse — map-only, one narrow row per doc; the only Exchange is fan_out's tiny-file round-robin (no-op at scale)",
    "pq_quantize": "single map-only projection: the 16x64-double codebook is ONE literal in the plan (HOF-indexed, no per-term duplication), all 64 subspace distances are JVM aggregate folds, argmin via array_position — no join, no Python; the one Exchange is fan_out's tiny-file round-robin (a no-op on multi-row-group inputs at scale)",
    "bpe_merges": "corpus collapses to word frequencies in the first agg; each of the 20 merge rounds is a vocab-sized (not corpus-sized) pair-count agg + argmax + HOF merge fold over the segmentation column — the iterative frame never exceeds |vocab| rows",
    "pq_adc_topk": "map-only code projection over the corpus scan, the 50-row query-table frame rides a BroadcastExchange into a BuildRight nested-loop join, and the per-qid top-k is pruned by a map-side WindowGroupLimit BEFORE the single qid exchange — ADC scoring itself is PQ_SUB element_at lookups + fixed-order adds, no per-pair vector math",
    "degree_assortativity": "degree agg with map-side partials, two node-keyed degree joins (AQE broadcasts the |V|-row degree table at runtime), ONE global algebraic agg — four BIGINT moments, the correlation arithmetic is a 1-row projection",
    "cusum_drift": "corpus collapses in the FIRST hash agg to (type, hour) rows; every window after (prefix sum, totals, argmax rank) is type-partitioned over that tiny frame — no global single-partition window",
    "media_type_profile": "the mapInPandas decode feeds a |formats|-row hash agg with partial aggregation — media bytes never shuffle; the plan is scan → ArrowEvalPython → partial/final agg",
    "rrf_fusion": "two bounded top-k subplans (broadcast query sides) union into a (qid, neighbor)-keyed agg and one qid-partitioned WindowGroupLimit — everything after the input rankers is |queries|×k-sized",
    "readability": "pure per-row array folds (sentence split + token folds) in one WholeStageCodegen span; ReadSchema pruned to (doc_id, text); zero Exchange",
    "linreg_by_group": "part dim rides a BroadcastExchange; ONE 25-group hash agg computes all five DECIMAL(38,0) moments with map-side partials (r10: the BIGINT Σy² hit ANSI ARITHMETIC_OVERFLOW past ~sf2 — wide decimals keep the monoid exact to 1e38); slope/intercept/r² are a projection over the aggregate",
    "ann_ivf_adc": "the r13 composition: checkpointed-Lloyd assignment feeds ONE map-only (cid, codes) index projection; the bounded probe frame (|q| x nprobe rows, one ADC table each) is the BuildRight of a broadcast HASH join ON cid — no corpus-wide pair table past the cell prefilter (the BNLJs are the bounded corpus x centroid assignment steps); per-qid top-k pruned by map-side WindowGroupLimit",
    "ivf_pq_residual": "checkpointed-Lloyd assignment + broadcast centroid join + one zip_with residual, then pq_quantize's map-only encode over the residual (dists once per subspace via struct+explode, codebook literal at test geometry / broadcast frame past 1 MiB) — the only exchanges are the Lloyd passes' own",
    "dsir_weights": "ONE corpus explode; the vocabulary agg carries raw AND target counts (count_if partial) in one pass; token-keyed vocab join (AQE decides broadcast at runtime — never broadcast at 100 TB vocab), 1-row totals broadcast, per-doc algebraic agg",
    "bm25_topk": "the r13 retrieval addition: the (doc, dl, word) tf index is built once and PERSISTED (InMemoryTableScan feeds df/query/postings branches — branch-specific optimization defeats exchange reuse); the bounded query-terms frame is the BuildRight of the posting BroadcastHashJoin so the corpus side never shuffles for the join; per-qid top-k pruned map-side by WindowGroupLimit; no BNLJ, no SMJ anywhere",
    "lexical_semantic_rrf": "bm25_topk's plan stacked with the df-capped shingle-Jaccard ranking (broadcast query shingles); the ONLY SortMergeJoin is the full-outer fuse of two <=|q|xk rank lists (full outer cannot broadcast-hash; both sides bounded); fused ranking pruned by WindowGroupLimit",
    "pq_train_codebooks": "the r14 PQ trainer's REPORT pass (the 3 Lloyd iterations are driver-loop scans that already ran): ONE map-only corpus projection scores BOTH codebooks (two parsed literals, dists built once per subspace each), explodes to 2 x PQ_SUB rows per vector, and hash-aggs on (variant, subspace, code) — no join of any kind; the only exchanges are fan_out's source repartition and the agg partial/final pair (test-pinned)",
    "pq_recall_report": "three search legs over the same broadcast 50-query frame — exact L2, seed-codebook ADC, trained-codebook ADC — each a corpus scan + BNLJ(vec_id<>qid) + WindowGroupLimit-pruned top-k (the cosine_topk/pq_adc_topk shape); the audit joins on the rank lists are explicitly F.broadcast (post-agg frames have no size estimates — unhinted, Catalyst co-shuffled two <=250-row sides as SortMergeJoin; test-pinned no-SMJ)",
    "bm25_recall_report": "the lexical recall audit: bm25_topk, bm25_pruned_topk, and lexical_semantic_rrf all feed from the ONE persisted tf index (InMemoryTableScan), candidates stay broadcast-hash on the bounded query-terms side, and the hit intersections + grid joins are rank-list-sized; no BNLJ (test-pinned)",
    "pca_debias": "map-only all-but-the-top: mean + direction are plan literals from the bounded _pca_fit driver loop; proj/norm_before are named Project columns computed ONCE and read by the residual fold (the LambdaVariable re-eval trap avoided); zero Exchange, zero joins",
    "cluster_balanced_sample": "checkpointed-Lloyd assignment (BNLJs are the bounded corpus x centroid steps), cid-keyed size join (k-row side — AQE broadcasts at test scale; at production k = n/40 it stays a key join), md5-ordered per-cid quota pruned map-side by WindowGroupLimit",
    "ann_probe_sweep": "the r15 nprobe sweep: ONE candidate fetch at max(ANN_PROBE_SET) — the bounded probe frame (|q| x 8 rows, cell rank carried) broadcasts onto the corpus-side cid HASH join (unhinted: SMJ of the corpus vs 400 window-output rows; pinned) — then an in-row explode of qualifying levels feeds one per-(nprobe, qid) WindowGroupLimit-pruned top-k; the 4-row level grid is explicitly broadcast onto the post-agg per-query frame (unhinted: CartesianProduct); exact leg = cosine_topk's BNLJ shape; audit joins rank-list-sized",
    "ivf_pq_adc_topk": "the r15 residual IVFADC search: ann_ivf_adc's pinned shape over the materialized residual frame (_residual_frame: fan_out + localCheckpoint — AQE had coalesced the post-agg residual to 1 partition, serializing the fold-heavy encode) with one ADC table PER (qid, cid) probe row (the per-probe query residual is a named Project column read once); bounded probe frame broadcast onto the cid hash join, WindowGroupLimit top-k, no SMJ/Cartesian",
    "ann_filtered_topk": "r15 filtered vector search: the language equality is an equi-join KEY, so the query-corpus pairing is a BroadcastHashJoin on (lang = qlang) with the vec_id<>qid residual as the join condition — NOT cosine_topk's BNLJ against every query; lang attach is a narrow vec_id hash join; per-qid top-k pruned map-side.  The plan-level argument for partitioning a 100 TB vector table by its filter column",
    "filtered_ann_recall_report": "r15 post-filter audit: ann_ivf's pinned candidate shape + one broadcast lang attach, the lang filter applied AFTER the cell prefilter; exact leg = ann_filtered_topk's BHJ-on-lang shape; audit joins rank-list-sized and explicitly broadcast",
    "adc_rerank_topk": "r15 two-stage retrieval: stage 1 = pq_adc_topk's pinned plan at CAP=25 (one code-column corpus pass, broadcast query ADC tables, map-side WindowGroupLimit); stage 2 fetches raw vectors BY KEY — the CAP-bounded candidate list broadcasts onto a vec_id hash join (never a second corpus pair-scan) and windows |q| x CAP rows; no SMJ/Cartesian (pinned)",
}


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark(app_name="mri-plan-dump")
    print("# PLANS — formatted physical plans (headline queries, sf0.01)")
    print()
    print("Regenerate with `python scripts/dump_plans.py > PLANS.md`.")
    print("What to look for in each plan is noted above it; the plan text")
    print("is Spark's `explain('formatted')` output, verbatim.")
    for name, note in NOTES.items():
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"  # noqa: SLF001
        )
        print(f"\n## {name}\n")
        print(f"*{note}*\n")
        print("```")
        print(plan.strip())
        print("```")
    spark.stop()


if __name__ == "__main__":
    main()
