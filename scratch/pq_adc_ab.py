"""A/B: pq_adc_topk corpus-side code build — r13 single-eval nested
transform (_pq_code_arr: the inner transform materializes the dists
array once; array_min + array_position scan the bound LambdaVariable)
vs the r12 double-eval form (the dists transform NAMED TWICE — once
inside array_position, once inside array_min — which Catalyst cannot
CSE under a LambdaVariable, doubling the PQ_SUB x n_codes x PQ_SUBDIM
fold work per row).

Context (VERDICT r13 "What's wrong"): BENCH_r12 -> BENCH_r13 recorded
pq_adc_topk 1.88 -> 2.18 s (+16%) even though the r13 code change
should have roughly HALVED the dominant corpus-pass compute.  The
bench artifacts were recorded on different hosts (the documented
0.75-1.35x host band), so this script settles it on ONE host, one
session, interleaved min-of-3: if single-eval wins here, the +16% was
host band; if it loses, the shared-helper shape has a real cost.

Run: python scratch/pq_adc_ab.py   (SPARK_GRAFT_SF_DIR to override)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark import session  # noqa: E402
from mapreduceinfrastructure_spark.operators import similarity as sim  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 3


def pq_adc_topk_r12(spark, sf_dir):
    """The r12 double-eval form, reconstructed verbatim from commit
    908743a (modulo the codebook-source helper, which at this geometry
    resolves to the same literal transport both then and now)."""
    emb = sim._embeddings(spark, sf_dir)
    cb = sim._pq_collect_codebook(emb)
    codes, flat_vals = cb
    n_codes = len(codes)
    flat = F.lit(flat_vals)

    code_arr = F.transform(
        F.sequence(F.lit(0), F.lit(sim.PQ_SUB - 1)),
        lambda s: (
            F.array_position(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_codes - 1)),
                    lambda c: sim._pq_d2(F.col("v"), flat, s, c),
                ),
                F.array_min(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_codes - 1)),
                        lambda c: sim._pq_d2(F.col("v"), flat, s, c),
                    )
                ),
            )
            - 1
        ).cast("int"),
    )
    corpus = emb.select("vec_id", code_arr.alias("cs"))

    table = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(sim.PQ_SUB - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(n_codes - 1)),
                lambda c: sim._pq_d2(F.col("qv"), flat, s, c),
            ),
        )
    )
    q = (
        emb.filter(F.col("vec_id") < sim.N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
        .select("qid", table.alias("t"))
    )

    pairs = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
    adc = sim._adc_sum(n_codes)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("adc"), F.col("neighbor_id"))
    return (
        pairs.select(
            "qid", F.col("vec_id").alias("neighbor_id"), adc.alias("adc")
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= sim.TOPK)
        .select("qid", "neighbor_id", F.round("adc", 6).alias("adc_d2"), "rn")
    )


def run(fn, spark):
    t0 = time.monotonic()
    n = fn(spark, SF_DIR).count()
    return time.monotonic() - t0, n


def main():
    spark = session.get_spark("pq_adc_ab")
    # warm both lineages once (codegen + file listing), then
    # interleave reps so session drift hits both arms equally.
    run(sim.pq_adc_topk, spark)
    run(pq_adc_topk_r12, spark)
    a, b = [], []
    rows = set()
    for _ in range(REPS):
        ta, na = run(sim.pq_adc_topk, spark)
        tb, nb = run(pq_adc_topk_r12, spark)
        a.append(ta)
        b.append(tb)
        rows.update([na, nb])
    assert len(rows) == 1, f"row counts diverged: {rows}"
    print(f"sf_dir={SF_DIR} rows={rows.pop()} reps={REPS}")
    print(f"single-eval (r13, shipped): min={min(a):.3f}s all={[round(x,3) for x in a]}")
    print(f"double-eval (r12, reconstructed): min={min(b):.3f}s all={[round(x,3) for x in b]}")
    print(f"ratio (r12/r13): {min(b)/min(a):.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
