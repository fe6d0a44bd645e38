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
