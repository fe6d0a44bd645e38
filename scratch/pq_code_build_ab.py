"""Isolate pq_adc_topk's corpus-side code build: three shapes for the
same (vec_id, cs: array<int>) projection, forced to full evaluation by
summing every code (no column pruning escape).

  A  single-eval nested transform (_pq_code_arr, shipped r13)
  B  double-eval (r12: the dists transform named twice per subspace)
  C  named-Project: dists array-of-arrays as its OWN Project column,
     argmin transform in a SECOND select (single-eval, no nested
     outer lambda — the pca_debias "name intermediates" discipline)

Run: python scratch/pq_code_build_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark import session  # noqa: E402
from mapreduceinfrastructure_spark.operators import similarity as sim  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def build(spark):
    emb = sim._embeddings(spark, SF_DIR)
    codes, flat_vals = sim._pq_collect_codebook(emb)
    return emb, F.lit(flat_vals), len(codes)


def shape_a(emb, flat, n_codes):
    return emb.select("vec_id", sim._pq_code_arr(flat, n_codes).alias("cs"))


def shape_b(emb, flat, n_codes):
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
    return emb.select("vec_id", code_arr.alias("cs"))


def shape_c(emb, flat, n_codes):
    dists = F.transform(
        F.sequence(F.lit(0), F.lit(sim.PQ_SUB - 1)),
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(n_codes - 1)),
            lambda c: sim._pq_d2(F.col("v"), flat, s, c),
        ),
    )
    return (
        emb.select("vec_id", dists.alias("dd"))
        .select(
            "vec_id",
            F.transform(
                F.col("dd"),
                lambda ds: (F.array_position(ds, F.array_min(ds)) - 1).cast(
                    "int"
                ),
            ).alias("cs"),
        )
    )


def timed(df):
    force = F.aggregate(F.col("cs"), F.lit(0), lambda a, x: a + x)
    t0 = time.monotonic()
    v = df.select(F.sum(force).alias("s")).collect()[0]["s"]
    return time.monotonic() - t0, v


def main():
    spark = session.get_spark("pq_code_build_ab")
    emb, flat, n_codes = build(spark)
    shapes = {
        "B double-eval (r12)": shape_b(emb, flat, n_codes),
        "A single nested (r13)": shape_a(emb, flat, n_codes),
        "C named-Project": shape_c(emb, flat, n_codes),
    }
    for name, df in shapes.items():  # warm
        timed(df)
    times = {k: [] for k in shapes}
    sums = set()
    for _ in range(REPS):
        for name, df in shapes.items():
            t, v = timed(df)
            times[name].append(t)
            sums.add(v)
    assert len(sums) == 1, f"code sums diverged: {sums}"
    print(f"sf_dir={SF_DIR} checksum={sums.pop()} reps={REPS}")
    for name, ts in times.items():
        print(f"{name}: min={min(ts):.3f}s all={[round(x, 3) for x in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
