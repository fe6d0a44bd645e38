"""Scaling study: where does the IVF prefilter pay for itself?

The test tables cap embeddings at 500 vectors, so ann_ivf_adc's
measured 4.5 s at sf0.1 is all fixed cost (Lloyd passes + collects) —
useless for judging the 100 TB story.  This script measures, on
synthetic corpora of n = 20k / 100k / 300k 64-dim vectors with ~64
Lloyd cells (N_CLUSTERS_MOD scaled to hold k constant — the production
regime where cells are capped by the quantizer, not corpus-linear):

  index  — build (vec_id, cid, codes) once: Lloyd passes + code
           projection, persisted + materialized;
  brute  — ADC scoring of ALL n codes for 50 queries (pq_adc_topk's
           scoring join, on the SAME prebuilt code table);
  ivf    — ADC scoring of only the nprobe=2 probed cells' codes (the
           ann_ivf_adc scoring join, same prebuilt table).

Expectation: scoring speedup ~ k/nprobe once n is large enough for the
scoring join to dominate scheduling overhead; the index build is the
amortized term (one build serves every query batch).  Run:

    python scratch/ivf_adc_crossover.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import mapreduceinfrastructure_spark.operators.similarity as sim
from mapreduceinfrastructure_spark.session import get_spark
from pyspark.sql import Window
from pyspark.sql import functions as F

DIM = 64
N_QUERIES = 50
NPROBE = 2
TOPK = 5
K_CELLS = 64
PQ_SUB, PQ_K = 4, 16
SUBDIM = DIM // PQ_SUB

spark = get_spark(app_name="ivf-adc-crossover")


def build_corpus(n: int):
    # Distributed generation — a driver-side createDataFrame of n x DIM
    # Python lists serializes GBs through py4j past ~1M rows.  The
    # study only times plan shapes, so any deterministic pseudo-random
    # vectors will do: the shader-hash fract(sin(...)*43758.5453),
    # computed JVM-side.  The codebook is generated separately in
    # numpy (timing needs a codebook, not THE codebook).
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda j: (
                    F.sin(F.col("id") * 12.9898 + j.cast("double") * 78.233)
                    * 43758.5453
                )
                % 1.0
                * 2.0
                - 1.0,
            ).alias("v"),
        )
        .repartition(32)
    )
    rng = np.random.default_rng(7)
    cb = rng.standard_normal((PQ_K, DIM)).astype("float64")
    return df.persist(), cb


def lloyd_assign(emb, n):
    mod = max(1, n // K_CELLS)
    cents = emb.filter(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def nearest(c):
        pairs = emb.crossJoin(F.broadcast(c)).withColumn(
            "d2", sim._sq_dist(F.col("v"), F.col("cv"))
        )
        return pairs.groupBy("vec_id").agg(
            F.min_by("cid", F.struct("d2", "cid")).alias("cid"),
            F.first("v").alias("v"),
        ).select("vec_id", "v", "cid")

    for _ in range(sim.LLOYD_ITERATIONS):
        a = nearest(cents)
        dims = a.select("cid", F.posexplode("v").alias("pos", "x"))
        means = dims.groupBy("cid", "pos").agg(F.avg("x").alias("m"))
        cents = (
            means.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cid", F.transform(F.col("pm"), lambda s: s["m"]).alias("cv"))
            .localCheckpoint(eager=True)
        )
    return nearest(cents), cents


def run(n: int):
    emb, cb = build_corpus(n)
    emb.count()
    flat = [float(x) for row in cb for x in row]

    # ---- index build (timed once) ----
    t0 = time.time()
    assign, cents = lloyd_assign(emb, n)
    code_arr = F.transform(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(PQ_K - 1)),
                lambda c: sim._pq_d2(F.col("v"), F.lit(flat), s, c),
            ),
        ),
        lambda ds: (F.array_position(ds, F.array_min(ds)) - 1).cast("int"),
    )
    index = assign.select("vec_id", "cid", code_arr.alias("cs")).persist()
    n_idx = index.count()
    t_index = time.time() - t0

    # ---- query side (shared) ----
    table = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(PQ_K - 1)),
                lambda c: sim._pq_d2(F.col("qv"), F.lit(flat), s, c),
            ),
        )
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    qt = q.select("qid", table.alias("t")).persist()
    qt.count()

    adc = F.lit(0.0)
    for s in range(PQ_SUB):
        adc = adc + F.element_at(F.col("t"), F.lit(s * PQ_K + 1) + F.col("cs")[s])
    w = Window.partitionBy("qid").orderBy(F.col("adc"), F.col("neighbor_id"))

    def topk(pairs):
        return (
            pairs.select("qid", F.col("vec_id").alias("neighbor_id"), adc.alias("adc"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOPK)
        )

    # ---- brute scoring over the prebuilt index ----
    t0 = time.time()
    brute = topk(index.join(F.broadcast(qt), F.col("vec_id") != F.col("qid")))
    nb = brute.count()
    t_brute = time.time() - t0

    # ---- ivf scoring: nprobe cells only ----
    t0 = time.time()
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "d2", sim._sq_dist(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cid"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= NPROBE)
        .join(qt, "qid")
        .select("qid", "cid", "t")
    )
    ivf = topk(
        index.join(F.broadcast(probes), "cid").filter(F.col("vec_id") != F.col("qid"))
    )
    ni = ivf.count()
    t_ivf = time.time() - t0

    print(
        f"n={n:>7}: index={t_index:6.1f}s  brute_score={t_brute:6.1f}s  "
        f"ivf_score={t_ivf:6.1f}s  speedup={t_brute / t_ivf:5.1f}x  "
        f"(rows idx={n_idx} brute={nb} ivf={ni})"
    )
    emb.unpersist(); index.unpersist(); qt.unpersist()


sizes = (
    [int(a) for a in sys.argv[1:]]
    if len(sys.argv) > 1
    else [20_000, 100_000, 300_000]
)
for n in sizes:
    run(n)
