"""Similarity search over the ``embeddings`` table (array<float> column).

North-star operators (BASELINE.json): brute-force cosine top-k as the
correctness baseline, LSH-bucketed ANN as the scale path, and
threshold-based embedding near-dup pairs.

Scale notes (100 TB design point):
- ``cosine_topk`` broadcasts the (small) query set and streams the
  corpus once — O(corpus × queries) flops, no corpus self-shuffle.
  All vector math is JVM higher-order functions in double precision.
- ``ann_lsh`` buckets vectors by random-hyperplane signature (16-bit),
  then searches only within buckets: candidate count drops by ~2^16/
  multiprobe factor.  The hyperplanes are deterministic (seeded PRNG
  literals) so results are reproducible across runs/sessions.
- ``embedding_neardup`` is the all-pairs exact variant — correct at
  small SF, superseded by ann_lsh buckets at scale (same verify math).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.vector import cosine_similarity_expr
from ..sources.tables import fan_out, load_table

EMBED_DIM = 64
N_PLANES = 16
TOPK = 5
N_QUERIES = 50


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for the first 50 query vectors.

    Query side is broadcast; corpus is scanned once.  Ties broken by
    neighbor id for determinism.
    """
    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    sim = cosine_similarity_expr(F.col("qv"), F.col("v"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        pairs.select("qid", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOPK)
        .select("qid", "neighbor_id", F.round("sim", 6).alias("cosine"), "rn")
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding near-dup: cosine ≥ 0.4 (calibrated to the
    synthetic data's similarity range), deduped as da < db."""
    emb = _embeddings(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("da"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("db"), F.col("v").alias("vb"))
    sim = cosine_similarity_expr(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("da") < F.col("db"))
        .select("da", "db", sim.alias("sim"))
        .filter(F.col("sim") >= 0.4)
        .select("da", "db", F.round("sim", 6).alias("cosine"))
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (seed 42) as plain literals —
    shipped to executors inside the plan, no closure capture."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((N_PLANES, EMBED_DIM)).tolist()


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 16-bit signature buckets, then
    exact cosine within buckets, top-5 per query.

    The scale path for similarity search: the corpus self-join becomes
    a bucket-equality join (shuffle on bucket id), and each bucket is
    small.  Recall < 1 by construction (rows-only check; the exact
    baseline is ``cosine_topk``).
    """
    emb = _embeddings(spark, sf_dir)
    planes = _hyperplanes()
    sig_bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    bucket = sum(
        (bit * (2**i) for i, bit in enumerate(sig_bits)), start=F.lit(0)
    )
    sig = emb.withColumn("bucket", bucket)
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "bucket"
    )
    cand = sig.join(F.broadcast(q), ["bucket"]).filter(F.col("vec_id") != F.col("qid"))
    sim = cosine_similarity_expr(F.col("qv"), F.col("v"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.select("qid", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOPK)
        .select("qid", "neighbor_id", F.round("sim", 6).alias("cosine"), "rn")
    )
