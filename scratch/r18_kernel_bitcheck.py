"""r18: prove the batchmath numpy kernels replay the JVM folds
bit-identically on the real sf0.01/sf0.1 corpus before rewiring any
operator.  Compares raw doubles with ==, no tolerance."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import numpy as np
from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.session import get_spark
from mapreduceinfrastructure_spark.operators import similarity as sim
from mapreduceinfrastructure_spark.functions import batchmath as bm
from mapreduceinfrastructure_spark.functions.vector import lit_double_array

spark = get_spark(app_name="r18-bitcheck")
emb = sim._embeddings(spark, SF_DIR)
rows = emb.orderBy("vec_id").collect()
V = np.array([r["v"] for r in rows], dtype=np.float64)
vids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
print(f"corpus: {len(rows)} vectors")

codes, seed_flat = sim._pq_collect_codebook(emb)
n_codes = len(codes)

# 1. _pq_code_arr vs pq_codes
t0 = time.time()
jvm_codes = (
    emb.select("vec_id", sim._pq_code_arr(lit_double_array(seed_flat), n_codes).alias("cs"))
    .orderBy("vec_id")
    .collect()
)
t_jvm = time.time() - t0
J = np.array([r["cs"] for r in jvm_codes], dtype=np.int32)
t0 = time.time()
N = bm.pq_codes(V, seed_flat, n_codes, sim.PQ_SUB, sim.PQ_SUBDIM)
t_np = time.time() - t0
print(f"pq_codes: identical={np.array_equal(J, N)} (jvm {t_jvm:.2f}s, np {t_np:.3f}s)")
assert np.array_equal(J, N)

# 2. subspace d2 vs _pq_d2 fold (spot check all subspaces, code 0 & last)
for c in (0, n_codes - 1):
    cols = [
        sim._pq_d2(F.col("v"), lit_double_array(seed_flat), s, c).alias(f"d{s}")
        for s in range(sim.PQ_SUB)
    ]
    jd = np.array(
        [[r[f"d{s}"] for s in range(sim.PQ_SUB)] for r in emb.select("vec_id", *cols).orderBy("vec_id").collect()]
    )
    nd = bm.subspace_d2(V, seed_flat, n_codes, sim.PQ_SUB, sim.PQ_SUBDIM)[:, :, c]
    print(f"subspace_d2 code {c}: identical={np.array_equal(jd, nd)}")
    assert np.array_equal(jd, nd)

# 3. exact-leg d2 fold vs full_d2
q = emb.filter(F.col("vec_id") < sim.N_QUERIES).select(
    F.col("vec_id").alias("qid"), F.col("v").alias("qv")
)
d2c = F.aggregate(
    F.zip_with("v", "qv", lambda x, y: (x - y) * (x - y)),
    F.lit(0.0),
    lambda acc, x: acc + x,
)
jp = (
    emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    .select("qid", F.col("vec_id").alias("nid"), d2c.alias("d2"))
    .orderBy("qid", "nid")
    .collect()
)
qmask = vids < sim.N_QUERIES
Q, qids = V[qmask], vids[qmask]
nd2 = bm.full_d2(V, Q)
jvm_map = {(r["qid"], r["nid"]): r["d2"] for r in jp}
mism = 0
for qi, qid in enumerate(qids):
    for vi, vid in enumerate(vids):
        if vid == qid:
            continue
        if jvm_map[(qid, vid)] != nd2[vi, qi]:
            mism += 1
print(f"full_d2: mismatches={mism} of {len(jp)}")
assert mism == 0

# 4. _adc_sum chain vs the numpy fixed-s-order accumulation
qt = q.select("qid", sim._pq_adc_table(lit_double_array(seed_flat), n_codes, F.col("qv")).alias("t"))
pairs = (
    emb.select("vec_id", sim._pq_code_arr(lit_double_array(seed_flat), n_codes).alias("cs"))
    .join(F.broadcast(qt), F.col("vec_id") != F.col("qid"))
    .select("qid", "vec_id", sim._adc_sum(n_codes).alias("adc"))
    .orderBy("qid", "vec_id")
    .collect()
)
T = bm.subspace_d2(Q, seed_flat, n_codes, sim.PQ_SUB, sim.PQ_SUBDIM)
acc = np.zeros((len(vids), len(qids)), dtype=np.float64)
for s in range(sim.PQ_SUB):
    acc += T[:, s, :][:, N[:, s]].T
jvm_adc = {(r["qid"], r["vec_id"]): r["adc"] for r in pairs}
mism = 0
for qi, qid in enumerate(qids):
    for vi, vid in enumerate(vids):
        if vid == qid:
            continue
        if jvm_adc[(qid, vid)] != acc[vi, qi]:
            mism += 1
print(f"adc_sum: mismatches={mism}")
assert mism == 0

# 5. dot fold vs pair_dot accumulation (cosine verify kernel)
from mapreduceinfrastructure_spark.functions.vector import dot_expr

jd = (
    emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    .select("qid", "vec_id", dot_expr(F.col("qv"), F.col("v")).alias("dot"))
    .orderBy("qid", "vec_id")
    .collect()
)
accd = np.zeros((len(vids), len(qids)), dtype=np.float64)
for j in range(sim.EMBED_DIM):
    accd += V[:, j][:, None] * Q[:, j][None, :]
jvm_dot = {(r["qid"], r["vec_id"]): r["dot"] for r in jd}
mism = sum(
    1
    for qi, qid in enumerate(qids)
    for vi, vid in enumerate(vids)
    if vid != qid and jvm_dot[(qid, vid)] != accd[vi, qi]
)
print(f"dot fold: mismatches={mism}")
assert mism == 0

# 6. _sq_dist (IVF nearest) vs full_d2 on centroids + min_by tie order
cents = emb.filter(F.col("vec_id") % sim.N_CLUSTERS_MOD == 0).select(
    F.col("vec_id").alias("cid"), F.col("v").alias("cv")
)
jn = (
    emb.crossJoin(F.broadcast(cents))
    .withColumn("d2", sim._sq_dist(F.col("v"), F.col("cv")))
    .groupBy("vec_id")
    .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
    .orderBy("vec_id")
    .collect()
)
cmask = vids % sim.N_CLUSTERS_MOD == 0
Cv, cids = V[cmask], vids[cmask]
nn = cids[np.argmin(bm.full_d2(V, Cv), axis=1)]
jn_arr = np.array([r["cid"] for r in jn], dtype=np.int64)
print(f"ivf nearest: identical={np.array_equal(jn_arr, nn)}")
assert np.array_equal(jn_arr, nn)

print("ALL KERNELS BIT-IDENTICAL")
spark.stop()
