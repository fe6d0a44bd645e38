"""Partition-count invariance: a distributed operator's RESULT must not
depend on how the data is partitioned.  Runs the round-4 operators
(those with float aggregations rounded for cross-engine stability)
under shuffle.partitions=1 and =64 and requires byte-identical rows —
this is the property the driver's order-insensitive value hash assumes,
and the test that would catch an order-dependent float aggregation
surviving the 6-decimal rounding."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

NAMES = [
    "word_pmi",
    "source_overlap",
    "incremental_dedup",
    "event_transitions",
    "trade_flows_2hop",
    "dup_spans",
    # round-6 float-bearing additions: kmeans sums doubles across
    # partitions (inertia@4dp, centroid means, shift@6dp) — the prime
    # candidate for order-dependent float drift; the others pin the
    # threshold compares and windowed picks
    "kmeans_step",
    "semdedup_prune",
    "dedup_rate_by_threshold",
    "quality_calibration",
    "token_budget_cap",
    # sketches: HLL's harmonic sum adds doubles across partitions
    "hll_distinct_users",
    "countmin_heavy_hitters",
    # value*duration double sums per user
    "time_weighted_avg",
    "quantile_sketch_quality",
    # the iterative trajectory: inertia/shift double sums per iteration
    "kmeans_iterate",
    # round-7 additions: cosine double-sum verify (strict near-dup),
    # harmonic-sum register merge (HLL union), revenue double sums over
    # the bucketed layout, and the LPA integer trajectory
    "embedding_neardup_strict",
    "hll_union_types",
    "bucketed_join_revenue",
    "label_prop_iterate",
    # prefix join: int/int jaccard + 6dp round across partitionings
    "prefix_filter_neardup",
    # sketch set-algebra: harmonic sums (HLL I-E), top-K sample
    # selection (KMV), streaming cell counts + quantile walk — all
    # must be partitioning-independent
    "hll_intersect_types",
    "kmv_intersect_types",
    "streaming_quantile_quality",
    "streaming_heavy_hitters",
    # round-8 additions: double rank sums iterated 5 rounds (the prime
    # order-dependence candidate), the positional-filter agg + jaccard
    # rounding, and the merge-on-read argmax + compacted-file re-read
    "pagerank_docs",
    "ppjoin_neardup",
    "compaction_roundtrip",
]


@pytest.mark.parametrize("name", NAMES)
def test_result_invariant_under_partitioning(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = set(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        many = set(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many
    assert len(one) > 0
