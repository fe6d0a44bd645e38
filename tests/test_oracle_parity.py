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
    "word_count",  # anchor
    "grep",  # anchor
    "wav_header_stats",  # never banked
    "pq_adc_topk",  # never banked
    "pq_quantize",  # never banked
    "bpe_merges",  # never banked
    "tpch_q18",  # stale (hash changed since r3 row)
    "neardup_audit",  # stale (hash changed since r6 row)
    "inverted_index_mr",  # stale (hash changed since r6 row)
    "dedup_clusters",  # stale (hash changed since r7 row)
    "dedup_rate_by_threshold",  # stale (hash changed since r7 row)
    "incremental_dedup",  # stale (hash changed since r7 row)
    "ngram_jaccard_neardup",  # stale (hash changed since r7 row)
    "embedding_neardup",  # stale (hash changed since r7 row)
    "embedding_neardup_strict",  # stale (hash changed since r7 row)
    "bucketed_join_revenue",  # stale (hash changed since r7 row)
    "orc_roundtrip",  # stale (hash changed since r7 row)
    "shard_manifest",  # stale (hash changed since r7 row)
    "streaming_custom_sessions",  # stale (hash changed since r7 row)
    "streaming_distinct_users_hll",  # stale (hash changed since r7 row)
    "hll_distinct_users",  # stale (hash changed since r7 row)
    "hll_intersect_types",  # stale (hash changed since r7 row)
    "hll_union_types",  # stale (hash changed since r7 row)
    "grep_mr",  # stale (hash changed since r7 row)
    "word_count_mr",  # stale (hash changed since r7 row)
    "pandas_udaf_geomean",  # stale (hash changed since r8 row)
    "zorder_layout",  # stale (hash changed since r8 row)
    "compaction_roundtrip",  # stale (hash changed since r8 row)
    "linreg_by_group",  # stale (hash changed since r9 row)
    "evolution_roundtrip",  # stale (hash changed since r9 row)
    "audio_energy",  # stale (hash changed since r11 row)
    "media_type_profile",  # stale (hash changed since r11 row)
    "multimodal_features",  # stale (hash changed since r11 row)
    "containment_neardup",  # stale (hash changed since r11 row)
    "ppjoin_neardup",  # stale (hash changed since r11 row)
    "prefix_filter_neardup",  # stale (hash changed since r11 row)
    "ann_lsh",  # stale (hash changed since r11 row)
    "rrf_fusion",  # stale (hash changed since r11 row)
    "pagerank_docs",  # stale (hash changed since r11 row)
    "tpch_q5",  # backfill (last banked r4)
    "edge_inversion",  # backfill (last banked r5)
    "histogram",  # backfill (last banked r5)
    "key_count",  # backfill (last banked r5)
    "rollup_pricing",  # backfill (last banked r5)
    "select_project",  # backfill (last banked r5)
    "sessionize",  # backfill (last banked r5)
    "sql_segment_spend",  # backfill (last banked r5)
    "tpch_q16",  # backfill (last banked r5)
    "tpch_q17",  # backfill (last banked r5)
    "tpch_q9",  # backfill (last banked r5)
]

def test_window_round_is_fresh():
    """The committed window must be for the CURRENT round, i.e. one past
    the newest banked CORRECTNESS_r*.json.  r11 shipped last round's
    window verbatim and the external driver silently re-verified stale
    evidence (VERDICT r11 #1); this turns that mistake into a red test
    the moment a new round starts on an un-regenerated window."""
    import glob
    import re as _re

    rounds = [
        int(m.group(1))
        for p in glob.glob("CORRECTNESS_r*.json")
        if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    assert rounds, "no CORRECTNESS_r*.json found — run from the repo root"
    assert entrymod.WINDOW_ROUND == max(rounds) + 1, (
        f"WINDOW_ROUND={entrymod.WINDOW_ROUND} but newest banked round is "
        f"r{max(rounds)} — regenerate the window: python scripts/ledger.py "
        f"sync && python scripts/rotation.py, paste into BOTH "
        f"__spark_entry__.py and this file, and bump WINDOW_ROUND"
    )


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
