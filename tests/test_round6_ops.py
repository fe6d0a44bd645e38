"""Cross-checks for the round-6 operators beyond oracle parity:
plan-shape pins and the algebraic invariants each operator's contract
promises (no-false-negative blooms, budget caps, percentile ordering,
a full partition of the vector set)."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_kmeans_step_partitions_all_vectors_single_pass(spark, sf_dir):
    """Every vector lands in exactly one cluster, inertia is finite,
    and the plan keeps the centroid side broadcast with no sort-merge
    or cartesian join (the assignment is one broadcast pass)."""
    df = QUERIES["kmeans_step"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan
    rows = df.collect()
    from mapreduceinfrastructure_spark.sources.tables import load_table

    n_vec = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_vec
    assert all(r["inertia"] >= 0 and r["centroid_shift"] >= 0 for r in rows)
    # the seed vector of each non-empty cluster is its own member, so
    # at most KMEANS_K clusters and every id in [0, K)
    from mapreduceinfrastructure_spark.operators.similarity import KMEANS_K

    assert {r["cluster"] for r in rows} <= set(range(KMEANS_K))


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """The one-sided contract: every exactly-contaminated doc is
    bloom-flagged.  Per source, bloom_flagged - false_pos must equal
    exactly_flagged (sum(bf*ef) == sum(ef) pointwise iff ef implies
    bf for every doc)."""
    rows = QUERIES["bloom_decontaminate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_flagged_bloom"] - r["n_false_pos"] == r["n_flagged_exact"], r
        assert 0 <= r["n_flagged_exact"] <= r["n_flagged_bloom"] <= r["n_docs"], r


def test_token_budget_cap_respects_budget(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.pipeline import (
        TOKEN_BUDGET_PER_SOURCE,
    )

    rows = QUERIES["token_budget_cap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["tokens_kept"] <= TOKEN_BUDGET_PER_SOURCE, r
        assert 0 < r["n_kept"] <= r["n_docs"], r
        # the cap binds only when the source actually exceeds it
        if r["tokens_arrived"] <= TOKEN_BUDGET_PER_SOURCE:
            assert r["n_kept"] == r["n_docs"], r


def test_quality_calibration_percentiles_ordered(spark, sf_dir):
    rows = QUERIES["quality_calibration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["p10"] <= r["p50"] <= r["p90"] <= 1.0, r
        assert 0.0 <= r["mean_q"] <= 1.0


def test_langid_eval_shares_sum_to_one(spark, sf_dir):
    rows = QUERIES["langid_eval"](spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["share_of_lang"]
    assert by_lang
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)
