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
    "word_count", "grep", "inverted_index", "tf_idf", "token_stats",
    "word_pmi", "pii_scrub", "stratified_sample", "key_count",
    "key_stats", "select_project", "histogram", "distinct_count",
    "join_revenue_by_nation", "join_anti", "edge_inversion",
    "distributed_sort", "topk_per_group", "rollup_pricing", "sessionize",
    "dedup_exact", "ngram_jaccard_neardup", "dedup_clusters",
    "incremental_dedup", "source_overlap", "cosine_topk",
    "embedding_neardup", "multimodal_features", "unpivot_measures",
    "percentile_by_brand", "json_extract_agg", "asof_join",
    "range_join_events", "funnel_conversion", "event_transitions",
    "triangle_count", "trade_flows_2hop", "keep_best_dedup",
    "decontamination", "data_mixture", "mixture_weights",
    "repetition_filter", "unigram_logprob_score", "pack_sequences",
    "split_assign", "curation_pipeline", "shard_manifest", "tpch_q1",
    "tpch_q5", "streaming_hourly_counts",
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
