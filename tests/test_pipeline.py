"""Semantic invariants for the training-pipeline curation operators
(operators/pipeline.py) beyond the exact oracle parity check."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.operators import pipeline as pl


def test_keep_best_keeps_longest_doc_per_canopy(spark, sf_dir):
    out = pl.keep_best_dedup(spark, sf_dir).cache()
    try:
        # one survivor per canopy, and clustering is non-trivial on this data
        assert out.groupBy("ck").count().filter("count > 1").count() == 0
        stats = out.agg(
            F.sum("cluster_size").alias("n_docs"),
            F.count("*").alias("n_clusters"),
            F.max("cluster_size").alias("max_cluster"),
        ).first()
        assert stats.n_docs > stats.n_clusters  # real multi-doc clusters exist
        assert stats.max_cluster >= 2
    finally:
        out.unpersist()


def test_decontamination_flags_benchmark_near_copies(spark, sf_dir):
    out = pl.decontamination(spark, sf_dir).cache()
    try:
        # no benchmark docs in the output, every training doc present
        assert out.filter(F.col("doc_id") % pl.BENCH_MOD == 0).count() == 0
        # the corpus contains near-copies of benchmark docs (TESTDATA's
        # near-dup pairs straddle the mod-20 split): they must be flagged
        flagged = out.filter("contaminated = 1")
        assert flagged.count() >= 1
        assert flagged.agg(F.max("n_hit_ngrams")).first()[0] >= 10
        # flag is consistent with the count, hits never exceed doc n-grams
        assert out.filter("(n_hit_ngrams > 0) != (contaminated = 1)").count() == 0
        assert out.filter("n_hit_ngrams > n_doc_ngrams").count() == 0
    finally:
        out.unpersist()


def test_data_mixture_shares_sum_to_one(spark, sf_dir):
    out = pl.data_mixture(spark, sf_dir)
    row = out.agg(
        F.sum("token_share").alias("s"), F.sum("n_docs").alias("d")
    ).first()
    assert abs(row.s - 1.0) < 1e-3  # rounded 6-dec shares over ~100 cells
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert row.d == n_docs


def test_pack_sequences_invariants(spark, sf_dir):
    out = pl.pack_sequences(spark, sf_dir).cache()
    try:
        # offsets stay inside a pack; pack ids start at 0 per source
        assert out.filter(
            (F.col("pack_offset") < 0) | (F.col("pack_offset") >= pl.PACK_LEN)
        ).count() == 0
        firsts = out.groupBy("source").agg(F.min("pack_id").alias("m"))
        assert firsts.filter("m != 0").count() == 0
        # packing is dense: pack_id never exceeds total_tokens // PACK_LEN
        chk = out.groupBy("source").agg(
            F.max("pack_id").alias("max_pack"), F.sum("n_tokens").alias("tot")
        )
        assert chk.filter(
            F.col("max_pack") > F.floor(F.col("tot") / pl.PACK_LEN)
        ).count() == 0
    finally:
        out.unpersist()


def test_split_assign_covers_all_docs(spark, sf_dir):
    out = pl.split_assign(spark, sf_dir)
    rows = {r["split"]: r for r in out.collect()}
    assert set(rows) == {"train", "val", "test"}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    # 12/16 of hex space is train; allow generous sampling slack
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]


def test_repetition_filter_fractions_bounded(spark, sf_dir):
    out = pl.repetition_filter(spark, sf_dir).cache()
    try:
        assert out.filter(
            (F.col("top_bigram_frac") <= 0)
            | (F.col("top_bigram_frac") > 1)
            | (F.col("dup_bigram_frac") < 0)
            | (F.col("dup_bigram_frac") >= 1)
        ).count() == 0
        assert out.filter("(top_bigram_frac > 0.10) != (flagged = 1)").count() == 0
    finally:
        out.unpersist()


def test_write_curated_shards_roundtrip(spark, sf_dir, tmp_path):
    """The materialized training shards must carry exactly the docs and
    tokens curation_pipeline accounts for, partitioned by source (so a
    sampling loader prunes partitions), with pack ids contiguous from 0
    per source."""
    import os

    from mapreduceinfrastructure_spark.operators.pipeline import (
        curation_pipeline,
        write_curated_shards,
    )

    out = str(tmp_path / "shards")
    manifest = write_curated_shards(spark, sf_dir, out)
    acct = curation_pipeline(spark, sf_dir).collect()
    assert manifest["n_docs"] == sum(r["n_docs_kept"] for r in acct)
    assert manifest["n_tokens"] == sum(r["n_tokens_kept"] for r in acct)
    # physical layout: one partition directory per source
    parts = {d for d in os.listdir(out) if d.startswith("source=")}
    assert len(parts) == len(acct)
    back = spark.read.parquet(out)
    for r in acct:
        per = back.filter(F.col("source") == r["source"])
        assert per.count() == r["n_docs_kept"]
        packs = [p["pack_id"] for p in per.select("pack_id").distinct().collect()]
        assert min(packs) == 0


def test_weighted_sample_biases_toward_heavy_docs(spark, sf_dir):
    """The A-ES key must actually implement weighted sampling: the mean
    token count of SELECTED docs should exceed the corpus mean (token
    count is the weight), and selection must be deterministic across
    invocations.  K per source and ranks 1..K pinned."""
    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.functions.text import tokens_expr
    from mapreduceinfrastructure_spark.operators import pipeline as pl
    from mapreduceinfrastructure_spark.sources.tables import load_table

    out1 = pl.weighted_sample(spark, sf_dir).collect()
    out2 = pl.weighted_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))

    per_source = {}
    for r in out1:
        per_source.setdefault(r["source"], []).append(r["rank"])
    for src, ranks in per_source.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), src
        assert len(ranks) <= pl.WEIGHTED_SAMPLE_K

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens_expr("text")).cast("double").alias("nt")
    )
    corpus_mean = docs.agg(F.avg("nt")).collect()[0][0]
    sel_ids = {r["doc_id"] for r in out1}
    sel_mean = (
        docs.filter(F.col("doc_id").isin(sel_ids)).agg(F.avg("nt")).collect()[0][0]
    )
    assert sel_mean > corpus_mean
