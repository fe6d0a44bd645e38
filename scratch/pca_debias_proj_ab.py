"""A/B: pca_debias's residual fold reading proj as a NAMED Project
column (shipped) vs inlining the proj fold inside the residual lambda
(the ADVICE-r12 LambdaVariable re-eval trap).  Catalyst skips
subexpression elimination under LambdaVariables, so the inlined form
re-evaluates the 64-term proj fold once PER ELEMENT of the residual
fold — a 64x blowup of that term.  Run:
    python scratch/pca_debias_proj_ab.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark.operators.similarity import (  # noqa: E402
    EMBED_DIM,
    _embeddings,
    _pca_fit,
)
from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="pca-debias-ab")
spark.sparkContext.setLogLevel("ERROR")

n, mu, w, lam = _pca_fit(spark, sf)
emb = _embeddings(spark, sf)
mu_l, w_l = F.lit(mu), F.lit(w)


def fold(term):
    return F.aggregate(F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)), F.lit(0.0), term)


def xc(j):
    return F.element_at(F.col("v"), j + 1) - F.element_at(mu_l, j + 1)


proj = fold(lambda acc, j: acc + xc(j) * F.element_at(w_l, j + 1))

# shipped: proj named once, residual fold reads the column
staged = emb.select("vec_id", "v", proj.alias("proj"))
na_named = F.sqrt(fold(
    lambda acc, j: acc
    + (xc(j) - F.col("proj") * F.element_at(w_l, j + 1))
    * (xc(j) - F.col("proj") * F.element_at(w_l, j + 1))
))
shipped = staged.select("vec_id", F.round(na_named, 6).alias("na"))

# trap: proj expression inlined inside the residual lambda
na_inline = F.sqrt(fold(
    lambda acc, j: acc
    + (xc(j) - proj * F.element_at(w_l, j + 1))
    * (xc(j) - proj * F.element_at(w_l, j + 1))
))
trap = emb.select("vec_id", F.round(na_inline, 6).alias("na"))


def best(df, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return min(ts)

# equality first (same values either way), then timing
a = {r["vec_id"]: r["na"] for r in shipped.collect()}
b = {r["vec_id"]: r["na"] for r in trap.collect()}
assert a == b, "forms disagree"
print(f"n={n} shipped={best(shipped):.3f}s inlined={best(trap):.3f}s")
