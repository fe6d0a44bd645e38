"""Cross-checks for the round-7 operators beyond oracle parity."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

QUERIES = entrymod.queries()


def test_strict_neardup_finds_every_planted_pair(spark, sf_dir):
    """100%-recall floor for the production regime at the test width:
    the analytic miss bound is (1 - p^8)^16 ~ 7e-5 per pair, so all
    PLANT_N planted near-duplicates (cosine pinned into [0.953,
    0.965] by the 1.3/0.7 re-weighting) must be found, as (i, i +
    PLANT_ID_OFFSET) pairs, and nothing else qualifies on the test
    corpora (64-d standard normal has no organic 0.9 pairs)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        PLANT_ID_OFFSET,
        PLANT_N,
        STRICT_COS,
    )

    rows = QUERIES["embedding_neardup_strict"](spark, sf_dir).collect()
    got = {(r["da"], r["db"]) for r in rows}
    want = {(i, i + PLANT_ID_OFFSET) for i in range(PLANT_N)}
    assert got == want, got.symmetric_difference(want)
    for r in rows:
        assert STRICT_COS <= r["cosine"] <= 0.965, r


def test_strict_neardup_single_bucket_no_probe_ball(spark, sf_dir):
    """The regime's defining property: each vector emits exactly ONE
    key per table (no Hamming ball), so the candidate join input is
    |corpus| x STRICT_N_TABLES rows — linear, not ball-multiplied —
    and the join arrives via explicit-width repartition (the AQE
    bytes-vs-compute coalescing pin, as semdedup_prune)."""
    import re

    from mapreduceinfrastructure_spark.operators.similarity import (
        PLANT_N,
        STRICT_BITS_FLOOR,
        STRICT_N_TABLES,
        _bits_per_table,
        _embeddings,
        _probe_keys,
    )
    from mapreduceinfrastructure_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    emb = _embeddings(spark, sf_dir)
    keys = _probe_keys(emb, max(STRICT_BITS_FLOOR, _bits_per_table(n + PLANT_N)),
                       radius=0, n_tables=STRICT_N_TABLES)
    assert keys.count() == n * STRICT_N_TABLES
    per_vec = keys.groupBy("vec_id", "tbl").count()
    assert per_vec.filter(F.col("count") != 1).count() == 0

    df = QUERIES["embedding_neardup_strict"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pins = [
        l
        for l in plan.splitlines()
        if "REPARTITION_BY_NUM" in l
        and re.search(r"hashpartitioning\(tbl#\d+, bucket#", l)
    ]
    assert len(pins) >= 2, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """The bucketed-table promise: both sides are pre-hashed into
    BUCKETED_N buckets at write time, so the sort-merge join reads
    bucketed scans directly — NO Exchange feeds the join; the only
    shuffle in the whole query is the final small per-priority agg."""
    df = QUERIES["bucketed_join_revenue"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final, final
    assert "Bucketed: true" in final
    assert "SelectedBucketsCount: 8 out of 8" in final
    join_part = final.split("SortMergeJoin")[1]
    # below the join: only scans/sorts — any Exchange there would mean
    # the bucketed layout was not used
    assert "Exchange" not in join_part, join_part
    # exactly one Exchange above the join (the o_orderpriority agg)
    above = final.split("SortMergeJoin")[0]
    assert above.count("Exchange") == 1, above


def test_label_prop_iterate_consistent_with_step_and_stable(spark, sf_dir):
    """Iteration 1 of the full LPA must agree exactly with the
    standalone label_prop_step (same update rule), and once a round
    changes nothing the fixed point must persist (the update is
    deterministic, so n_changed=0 is absorbing)."""
    rows = sorted(
        QUERIES["label_prop_iterate"](spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    step = QUERIES["label_prop_step"](spark, sf_dir).collect()
    n_nodes = len(step)
    it1_labels = {r["new_label"] for r in step}
    assert rows[0]["n_communities"] == len(it1_labels)
    assert rows[0]["n_changed"] <= n_nodes
    for r in rows:
        assert 1 <= r["n_communities"] <= n_nodes
        assert r["largest_community"] <= n_nodes
        assert 0 <= r["n_changed"] <= n_nodes
    for lo, hi in zip(rows, rows[1:]):
        if lo["n_changed"] == 0:
            assert hi["n_changed"] == 0
            assert hi["n_communities"] == lo["n_communities"]
            assert hi["largest_community"] == lo["largest_community"]


def test_prefix_filter_equals_uncapped_exact_pairs(spark, sf_dir):
    """Completeness of the prefix-filter principle, end to end: the
    candidate join sees only prefix shingles, yet the verified result
    must equal the UNCAPPED all-pairs shingle join at the same
    threshold — no pair escapes the prefix (rarest-first global order,
    length |x| - ceil(t|x|) + 1)."""
    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _exact_pairs,
    )

    got = {
        (r["da"], r["db"], r["jaccard"])
        for r in QUERIES["prefix_filter_neardup"](spark, sf_dir).collect()
    }
    want = {
        (r["da"], r["db"], round(r["jaccard"], 6))
        for r in _exact_pairs(spark, sf_dir, PREFIX_JACCARD_T)
        .select("da", "db", "jaccard")
        .collect()
    }
    assert got == want and len(got) > 0


def test_prefix_filter_prunes_candidate_volume(spark, sf_dir):
    """The point of the prefix: the join input must be a strict subset
    of the shingle rows (~(1-t) of each doc's set), and hot shingles
    must be under-represented in prefixes relative to the corpus (the
    rarest-first order pushes them to the suffix)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mapreduceinfrastructure_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _shingles,
    )

    sh = _shingles(spark, sf_dir)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = sh.join(dfreq, "shingle").withColumn(
        "rn", F.row_number().over(w)
    ).join(sizes, "doc_id")
    plen = F.col("n") - F.ceil(F.lit(PREFIX_JACCARD_T) * F.col("n")) + 1
    pref = ranked.filter(F.col("rn") <= plen)
    n_all, n_pref = sh.count(), pref.count()
    assert 0 < n_pref < n_all * (1 - PREFIX_JACCARD_T) + sh.select("doc_id").distinct().count()
    mean_df_all = dfreq.join(sh, "shingle").agg(F.avg("df")).collect()[0][0]
    mean_df_pref = pref.agg(F.avg("df")).collect()[0][0]
    assert mean_df_pref < mean_df_all


def test_kmv_intersection_within_error_bound(spark, sf_dir):
    """KMV with K=256 has ~6.3% std error (1/sqrt(K-2)); require every
    pairwise intersection estimate within 4 sigma — and in the
    small-range regime (|union| < K the sample is complete) the
    estimate must be EXACT."""
    from mapreduceinfrastructure_spark.operators.sketches import KMV_K

    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = QUERIES["kmv_intersect_types"](spark, sf_dir).collect()
    assert rows
    per_type = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.col("user_id").cast("string")).alias("n"))
        .collect()
    }
    bound = 4.0 / (KMV_K - 2) ** 0.5
    for r in rows:
        assert abs(r["rel_err"]) <= bound, r
        union = per_type[r["ta"]] + per_type[r["tb"]] - r["n_exact_inter"]
        if union < KMV_K:  # complete-sample regime: estimate is exact
            assert r["n_kmv_inter"] == float(r["n_exact_inter"]), r


def test_length_ks_matches_scipy_reference(spark, sf_dir):
    """The KS statistic must equal an independent numpy two-sample
    ECDF computation (source vs corpus) evaluated on the global
    support, and sit in [0, 1) with a valid peak length."""
    import numpy as np

    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = {r["source"]: r for r in QUERIES["length_ks_by_source"](spark, sf_dir).collect()}
    pdf = load_table(spark, sf_dir, "documents").select("source", "n_chars").toPandas()
    support = np.sort(pdf["n_chars"].unique())
    all_l = np.sort(pdf["n_chars"].to_numpy())
    for src, r in rows.items():
        s_l = np.sort(pdf[pdf["source"] == src]["n_chars"].to_numpy())
        fs = np.searchsorted(s_l, support, side="right") / len(s_l)
        fg = np.searchsorted(all_l, support, side="right") / len(all_l)
        ks = np.abs(fs - fg).max()
        assert abs(r["ks_stat"] - round(float(ks), 6)) <= 1e-6, (src, r, ks)
        assert 0.0 <= r["ks_stat"] < 1.0
