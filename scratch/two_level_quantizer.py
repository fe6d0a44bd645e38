"""Prototype: two-level quantizer for IVF assignment at large k.

SCALE.md's ann_ivf_adc sizing note says the flat crossJoin-argmin
assignment dies when the centroid table outgrows broadcast range
(k = n/40 is corpus-linear).  The standard fix (IMI/hierarchical
coarse quantizers) is to cluster the centroids themselves into g
groups, assign each vector to its nearest GROUP first (n x g
distances), then argmin only over that group's members (n x k/g
average) — total ~n x (g + k/g), minimized at g = sqrt(k), vs the
flat n x k.

This prototype measures, at n vectors / k centroids / g groups:
  flat      — crossJoin(broadcast(cents)) + min_by argmin (the shipped
              ivf_assignments shape);
  two-level — leader assignment of centroids (k x g, tiny), vector
              coarse pass (n x g), in-group fine pass (n x p*k/g via a
              gid-keyed broadcast hash join), for each coarse probe
              width p in PROBES (p=1 is pure nearest-group; larger p
              searches the p nearest groups' members, the IMI
              multi-probe trick);
  agreement — fraction of vectors whose two-level cell equals the
              flat argmin cell (the coarse pass is approximate: the
              nearest group's members may not contain the true
              nearest centroid; agreement -> 1 as p -> g).

Run: python scratch/two_level_quantizer.py [n k g]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import mapreduceinfrastructure_spark.operators.similarity as sim
from mapreduceinfrastructure_spark.session import get_spark
from pyspark.sql import Window
from pyspark.sql import functions as F

DIM = 64

n = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
k = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
g = int(sys.argv[3]) if len(sys.argv) > 3 else 32

spark = get_spark(app_name="two-level-quantizer")


def hashvec(idcol, salt: float):
    return F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (F.sin(idcol * 12.9898 + j.cast("double") * 78.233 + salt)
                   * 43758.5453) % 1.0 * 2.0 - 1.0,
    )


emb = (
    spark.range(n)
    .select(F.col("id").alias("vec_id"), hashvec(F.col("id"), 0.0).alias("v"))
    .repartition(32)
    .persist()
)
emb.count()
cents = (
    spark.range(k)
    .select(F.col("id").alias("cid"), hashvec(F.col("id"), 7.7).alias("cv"))
    .persist()
)
cents.count()

# ---- flat argmin (the shipped shape) ----
t0 = time.time()
flat = (
    emb.crossJoin(F.broadcast(cents))
    .withColumn("d2", sim._sq_dist(F.col("v"), F.col("cv")))
    .groupBy("vec_id")
    .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    .persist()
)
flat.count()
t_flat = time.time() - t0

# ---- two-level, at each coarse-probe width p ----
# leaders: every (k//g)-th centroid; assign each centroid to a group
leaders = cents.filter(F.col("cid") % (k // g) == 0).select(
    F.col("cid").alias("gid"), F.col("cv").alias("gv")
)
cent_groups = (
    cents.crossJoin(F.broadcast(leaders))
    .withColumn("d2", sim._sq_dist(F.col("cv"), F.col("gv")))
    .groupBy("cid")
    .agg(F.min_by("gid", F.struct("d2", "gid")).alias("gid"),
         F.first("cv").alias("cv"))
    .persist()
)
cent_groups.count()

PROBES = [1, 2, 4]
print(f"n={n} k={k} g={g}: flat={t_flat:.1f}s")
for p in PROBES:
    t0 = time.time()
    # vector coarse pass: p nearest group leaders (n x g distances,
    # then a size-g in-row sort — negligible vs the distance folds)
    coarse = (
        emb.crossJoin(F.broadcast(leaders))
        .withColumn("d2", sim._sq_dist(F.col("v"), F.col("gv")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy("d2", "gid")
            ),
        )
        .filter(F.col("rn") <= p)
        .select("vec_id", "gid", "v")
    )
    # fine pass: argmin over the probed groups' members (gid-keyed
    # broadcast hash join; p*k/g candidate centroids per vector)
    two = (
        coarse.join(F.broadcast(cent_groups), "gid")
        .withColumn("d2", sim._sq_dist(F.col("v"), F.col("cv")))
        .groupBy("vec_id")
        .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
        .persist()
    )
    two.count()
    t_two = time.time() - t0
    agree = (
        flat.alias("a")
        .join(two.alias("b"), "vec_id")
        .filter(F.col("a.cid") == F.col("b.cid"))
        .count()
    )
    two.unpersist()
    print(
        f"  p={p}: two_level={t_two:.1f}s speedup={t_flat / t_two:.1f}x "
        f"agreement={agree}/{n} ({100.0 * agree / n:.2f}%)"
    )
