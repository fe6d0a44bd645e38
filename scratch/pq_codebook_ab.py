"""A/B: PQ codebook transport at PRODUCTION geometry (VERDICT r12 #5).

Geometry 16 subspaces x 256 codes x 1024 dims (the standard IVF-PQ
shape for 1024-dim embeddings): the flattened codebook is 256 x 1024
doubles = 2 MiB.  Compares, for the pq_quantize encode pass over a
synthetic corpus:

  A) plan-literal transport (the test-geometry default): the 2 MiB
     array is a Literal in the expression tree -> serialized into the
     task binary of EVERY stage;
  B) broadcast 1-row frame (_pq_codebook_source past
     PQ_CODEBOOK_LITERAL_MAX_BYTES): the array ships once per executor
     through a BroadcastExchange, O(1) bytes in the task binary.

Metrics: optimized-plan JSON size (the literal's in-plan footprint —
the payload Spark re-serializes per stage submission), wall time of
the encode pass, and row-level agreement.  Run:

    python scratch/pq_codebook_ab.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from mapreduceinfrastructure_spark.operators import similarity as sim
from mapreduceinfrastructure_spark.session import get_spark
from pyspark.sql import functions as F

PQ_SUB, PQ_K, DIM = 16, 256, 1024
N_VECTORS = 20_000

spark = get_spark()

rng = np.random.default_rng(42)
vecs = rng.standard_normal((N_VECTORS, DIM)).astype("float64")
emb = spark.createDataFrame(
    [(int(i), v.tolist()) for i, v in enumerate(vecs)],
    "vec_id long, v array<double>",
)
emb = emb.repartition(32).persist()
emb.count()

# production-geometry module constants for this session
sim.PQ_SUB, sim.PQ_K, sim.PQ_SUBDIM, sim.EMBED_DIM = (
    PQ_SUB,
    PQ_K,
    PQ_SUBDIM := DIM // PQ_SUB,
    DIM,
)

codes = list(range(PQ_K))
flat_vals = [float(x) for i in range(PQ_K) for x in vecs[i]]
print(f"codebook: {len(flat_vals)} doubles = {len(flat_vals) * 8 / 2**20:.2f} MiB")


def encode(df, flat_col):
    sub = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_SUB - 1)),
        lambda s: F.struct(
            s.cast("long").alias("subspace"),
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_K - 1)),
                lambda c: sim._pq_d2(F.col("v"), flat_col, s, c),
            ).alias("dists"),
        ),
    )
    return (
        df.select("vec_id", F.explode(sub).alias("q"))
        .select(
            "vec_id",
            "q.subspace",
            (F.array_position(F.col("q.dists"), F.array_min("q.dists")) - 1)
            .cast("long")
            .alias("code"),
        )
    )


def run(tag, df, flat_col):
    out = encode(df, flat_col)
    plan_json = out._jdf.queryExecution().optimizedPlan().toJSON()
    t0 = time.time()
    agg = out.agg(
        F.count("*").alias("n"), F.sum(F.col("code") * F.col("subspace")).alias("chk")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"{tag}: plan_json={len(plan_json) / 2**20:.2f} MiB "
        f"wall={dt:.1f}s rows={agg['n']} checksum={agg['chk']}"
    )
    return agg["n"], agg["chk"]


# A: literal
a = run("A literal ", emb, F.lit(flat_vals))

# B: broadcast frame
sim_thresh = sim.PQ_CODEBOOK_LITERAL_MAX_BYTES
sim.PQ_CODEBOOK_LITERAL_MAX_BYTES = 0
src, col = sim._pq_codebook_source(emb, flat_vals)
b = run("B broadcast", src, col)
sim.PQ_CODEBOOK_LITERAL_MAX_BYTES = sim_thresh

print("AGREE" if a == b else "DIVERGE")
