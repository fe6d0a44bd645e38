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
    "minhash_lsh_neardup",  # stale (hash changed since r13 row)
    "cosine_topk",  # stale (hash changed since r14 row)
    "ivf_split_plan",  # stale (hash changed since r16 row)
    "streaming_cell_occupancy",  # stale (hash changed since r16 row)
    "streaming_pq_ingest",  # stale (hash changed since r16 row)
    "adc_rerank_topk",  # stale (hash changed since r17 row)
    "ann_ivf",  # stale (hash changed since r17 row)
    "ann_ivf_adc",  # stale (hash changed since r17 row)
    "ann_probe_sweep",  # stale (hash changed since r17 row)
    "ann_recall_report",  # stale (hash changed since r17 row)
    "bm25_recall_report",  # stale (hash changed since r17 row)
    "cc_star",  # stale (hash changed since r17 row)
    "cluster_balanced_sample",  # stale (hash changed since r17 row)
    "cluster_diameter",  # stale (hash changed since r17 row)
    "dedup_clusters",  # stale (hash changed since r17 row)
    "dedup_rate_by_threshold",  # stale (hash changed since r17 row)
    "filtered_ann_recall_report",  # stale (hash changed since r17 row)
    "incremental_dedup",  # stale (hash changed since r17 row)
    "ivf_pq_adc_topk",  # stale (hash changed since r17 row)
    "ivf_pq_probe_sweep",  # stale (hash changed since r17 row)
    "ivf_pq_recall_report",  # stale (hash changed since r17 row)
    "ivf_pq_rerank_recall_report",  # stale (hash changed since r17 row)
    "ivf_pq_rerank_topk",  # stale (hash changed since r17 row)
    "ivf_pq_residual",  # stale (hash changed since r17 row)
    "ivf_split_apply",  # stale (hash changed since r17 row)
    "lexical_semantic_rrf",  # stale (hash changed since r17 row)
    "neardup_audit",  # stale (hash changed since r17 row)
    "ngram_jaccard_neardup",  # stale (hash changed since r17 row)
    "pq_adc_topk",  # stale (hash changed since r17 row)
    "pq_bits_recall_report",  # stale (hash changed since r17 row)
    "pq_quantize",  # stale (hash changed since r17 row)
    "pq_recall_report",  # stale (hash changed since r17 row)
    "pq_train_codebooks",  # stale (hash changed since r17 row)
    "rerank_cap_sweep",  # stale (hash changed since r17 row)
    "rrf_fusion",  # stale (hash changed since r17 row)
    "source_overlap",  # stale (hash changed since r17 row)
    "sorted_neighborhood_neardup",  # backfill (last banked r9)
    "stratified_sample",  # backfill (last banked r9)
    "streaming_active_users",  # backfill (last banked r9)
    "streaming_curated_ingest",  # backfill (last banked r9)
    "streaming_enriched_revenue",  # backfill (last banked r9)
    "streaming_hourly_counts",  # backfill (last banked r9)
    "streaming_ohlc",  # backfill (last banked r9)
    "streaming_sessions",  # backfill (last banked r9)
    "tf_idf",  # backfill (last banked r9)
    "token_stats",  # backfill (last banked r9)
    "trade_edges",  # backfill (last banked r9)
    "trade_flows_2hop",  # backfill (last banked r9)
]

def test_window_round_is_fresh():
    """The committed window must be for the CURRENT round, i.e. one past
    the newest banked CORRECTNESS_r*.json.  r11 shipped last round's
    window verbatim and the external driver silently re-verified stale
    evidence (VERDICT r11 #1); this turns that mistake into a red test
    the moment a new round starts on an un-regenerated window.

    INTER-ROUND SEMANTICS (intentional, VERDICT r12 #3): the moment a
    round's CORRECTNESS artifact lands on disk, this test goes red
    until the NEXT round's first action (`python scripts/ledger.py
    sync && python scripts/paste_window.py`) regenerates the window.
    A red here right after a round banks is the designed
    start-of-round forcing function, not a code defect — see
    README.md "Round protocol" and .claude/skills/verify/SKILL.md."""
    import glob
    import os
    import re as _re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := _re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    assert rounds, "no CORRECTNESS_r*.json found in the repo root"
    assert entrymod.WINDOW_ROUND == max(rounds) + 1, (
        f"WINDOW_ROUND={entrymod.WINDOW_ROUND} but newest banked round is "
        f"r{max(rounds)} — regenerate the window: python scripts/ledger.py "
        f"sync && python scripts/paste_window.py (rewrites both pinned "
        f"copies and bumps WINDOW_ROUND)"
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


def test_every_oracle_compiles_in_duckdb(duck):
    """Registry-wide binder check: EXPLAIN every oracle_sql() entry so
    a syntax/name error in a NON-windowed oracle fails here in seconds
    instead of surfacing as a driver `err` whenever rotation happens to
    pull that query into a future window.  EXPLAIN plans (parses +
    binds against the real views) without executing, so even the
    unrolled Lloyd/PCA CTE chains stay cheap."""
    bad = []
    for name, sql in sorted(ORACLES.items()):
        try:
            duck.sql(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collecting all failures
            bad.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not bad, "\n".join(bad)
