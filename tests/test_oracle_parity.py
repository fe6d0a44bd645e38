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
    "word_count", "grep", "market_basket_rules", "clustering_coeff",
    "neyman_allocation", "oov_rate", "evolution_roundtrip",
    "dq_referential_audit", "streaming_ohlc", "sssp_parts",
    "array_funcs_catalog", "null_safe_join", "ivm_source_stats",
    "streaming_abandoned_views", "basket_triples", "ohlc_bars",
    "scd2_intervals", "interval_concurrency", "mad_outliers",
    "event_trigrams", "simhash", "simhash_neardup", "minhash_lsh_neardup",
    "sentence_stats", "frame_offsets", "runtime_filter_join",
    "zorder_layout", "skew_profile", "range_partition_plan",
    "pagerank_docs", "cc_star", "kcore_peel", "compaction_roundtrip",
    "kl_source_divergence", "source_signature", "window_funcs_catalog",
    "scalar_subquery", "skew_safe_distinct", "token_positions",
    "grouping_sets_pricing", "pandas_udaf_geomean", "udtf_chunk_text",
    "time_rollup", "deterministic_sample", "stats_aggregates",
    "not_in_null_aware", "argmax_order", "nested_roundtrip",
    "cross_join_grid", "bag_except",
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
