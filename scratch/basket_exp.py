import time, os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
MIN_W = 2

def old_pairs():
    op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    return (op.join(op.select("ok", F.col("pk").alias("pb")), "ok")
            .filter(F.col("pk") < F.col("pb"))
            .groupBy(F.col("pk").alias("pa"), "pb")
            .agg(F.count("*").alias("w")).filter(F.col("w") >= MIN_W).select("pa","pb","w"))

def new_pairs():
    baskets = (li.groupBy(F.col("l_orderkey").alias("ok"))
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts")))
    pair = F.explode(F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts) - i - 1), "
        "y -> struct(x AS pa, y AS pb))))")).alias("p")
    return (baskets.select(pair).select("p.pa", "p.pb")
            .groupBy("pa","pb").agg(F.count("*").alias("w"))
            .filter(F.col("w") >= MIN_W))

# parity
a = old_pairs(); b = new_pairs()
d1 = a.exceptAll(b).count(); d2 = b.exceptAll(a).count()
print("parity diffs:", d1, d2, "rows:", a.count())

for name, fn in (("old", old_pairs), ("new", new_pairs)):
    ts = []
    for _ in range(3):
        t0 = time.time(); fn().count(); ts.append(time.time()-t0)
    print(name, "min %.2f  all %s" % (min(ts), ["%.2f"%t for t in ts]))

# triples parity
def old_triples():
    op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    return (op.join(op.select("ok", F.col("pk").alias("pb")), "ok").filter(F.col("pk") < F.col("pb"))
            .join(op.select("ok", F.col("pk").alias("pc")), "ok").filter(F.col("pb") < F.col("pc"))
            .groupBy(F.col("pk").alias("pa"), "pb", "pc").agg(F.count("*").cast("long").alias("n_orders"))
            .filter(F.col("n_orders") >= MIN_W))

def new_triples():
    baskets = (li.groupBy(F.col("l_orderkey").alias("ok"))
               .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts")))
    trip = F.explode(F.expr(
        "flatten(transform(parts, (x, i) -> flatten("
        "transform(slice(parts, i + 2, size(parts) - i - 1), (y, j) -> "
        "transform(slice(parts, i + j + 3, size(parts) - i - j - 2), "
        "z -> struct(x AS pa, y AS pb, z AS pc))))))")).alias("t")
    return (baskets.select(trip).select("t.pa","t.pb","t.pc")
            .groupBy("pa","pb","pc").agg(F.count("*").cast("long").alias("n_orders"))
            .filter(F.col("n_orders") >= MIN_W))

a = old_triples(); b = new_triples()
print("triple parity diffs:", a.exceptAll(b).count(), b.exceptAll(a).count(), "rows:", a.count())
for name, fn in (("old_tri", old_triples), ("new_tri", new_triples)):
    ts = []
    for _ in range(3):
        t0 = time.time(); fn().count(); ts.append(time.time()-t0)
    print(name, "min %.2f  all %s" % (min(ts), ["%.2f"%t for t in ts]))
spark.stop()
