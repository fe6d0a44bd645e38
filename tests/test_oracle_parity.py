"""Oracle parity for every queries()/oracle_sql() pair — the same check
the driver runs at sf=0.01 (row count + schema + order-insensitive
values), run exactly, not by hash, so mismatches show diffs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_consistency():
    # every oracle key must have a query; queries without oracle are the
    # documented weaker rows-only ops
    assert set(ORACLES) <= set(QUERIES)


# The driver's correctness harness verifies EXACTLY queries() entries
# 1-50 against oracle_sql.  This pin makes the window composition a
# hard invariant instead of a comment: every windowed entry must carry
# an exact oracle, and the exact 50-list is frozen so an accidental
# insertion/reorder can't silently push an oracle-backed query out of
# (or a rows-only query into) the verified window.
DRIVER_WINDOW = [
    "word_count", "grep", "grep_mr", "union_all_op", "map_explode",
    "streaming_curated_ingest_watermarked", "token_budget_cap",
    "kmeans_step", "bloom_decontaminate", "langid_eval",
    "quality_calibration", "dedup_rate_by_threshold", "semdedup_prune",
    "packing_efficiency", "hll_distinct_users", "countmin_heavy_hitters",
    "time_weighted_avg", "label_prop_step", "streaming_distinct_users_hll",
    "quantile_sketch_quality", "kmeans_iterate",
    "embedding_neardup_strict", "orc_roundtrip", "hll_union_types",
    "bucketed_join_revenue", "label_prop_iterate",
    "streaming_heavy_hitters", "prefix_filter_neardup",
    "streaming_custom_sessions", "hll_intersect_types",
    "kmv_intersect_types", "streaming_quantile_quality",
    "length_ks_by_source",
    "word_count_mr", "key_stats", "join_revenue_by_nation",
    "topk_per_group",
    "salted_join", "asof_join", "dedup_exact", "ngram_jaccard_neardup",
    "dedup_clusters", "incremental_dedup", "cosine_topk",
    "embedding_neardup", "shard_manifest", "language_id", "tpch_q1",
    "tpch_q21", "triangle_count",
]


def test_driver_window_is_oracle_backed():
    window = list(QUERIES)[:50]
    assert len(DRIVER_WINDOW) == 50
    assert window == DRIVER_WINDOW
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"windowed queries without an exact oracle: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
