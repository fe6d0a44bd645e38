"""Reproducible harness behind SCALE.md "r17 rerank-CAP sweep" /
"r17 codebook-bits rung" / "r17 ivf_split_apply": mean recall per
operating point at sf0.01 and sf0.1, plus the split-apply occupancy
deltas, measured from the registry queries themselves (one fresh
session; first calls pay the train-once memos, as a cold audit
would)."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
import __spark_entry__ as e

spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    print("==", sf)
    t0 = time.time()
    rows = qs["rerank_cap_sweep"](spark, sf).groupBy("cap").agg(
        F.round(F.avg("recall"), 3).alias("mean_recall")).orderBy("cap").collect()
    print("cap_sweep", [(r["cap"], r["mean_recall"]) for r in rows], f"{time.time()-t0:.1f}s")
    t0 = time.time()
    rows = qs["pq_bits_recall_report"](spark, sf).groupBy("bits").agg(
        F.round(F.avg("recall"), 3).alias("mean_recall")).orderBy("bits").collect()
    print("bits", [(r["bits"], r["mean_recall"]) for r in rows], f"{time.time()-t0:.1f}s")
    t0 = time.time()
    rows = qs["ivf_split_apply"](spark, sf).collect()
    mx_b = max(r["n_before"] for r in rows); mx_a = max(max(r["n_keep"], r["n_split"]) for r in rows)
    print("split_apply cells=", len(rows), "max_occ", mx_b, "->", mx_a, f"{time.time()-t0:.1f}s")
spark.stop()
