"""Driver simulation — exercises /root/repo/__spark_entry__.py exactly as
the grading driver does: entry() smoke at sf0.001, then each queries()[name]
vs oracle_sql()[name] at sf0.01 with order-insensitive value hashing."""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
    if len(pdf) == 0:
        return hashlib.md5(("|".join(pdf.columns)).encode()).hexdigest()
    rows = sorted(pdf.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


# smoke
t0 = time.time()
smoke = e.entry(spark)
n = smoke.count()
print(f"SMOKE entry(): rows={n} schema={smoke.schema.simpleString()} ({time.time()-t0:.1f}s)")
assert n > 0

qs, oracles = e.queries(), e.oracle_sql()
only = {s for s in os.environ.get("SPARK_GRAFT_VERIFY_ONLY", "").split(",") if s}
if only:
    qs = {k: v for k, v in qs.items() if k in only}
fails = []
for name in sorted(qs):
    t0 = time.time()
    got = qs[name](spark, SF).toPandas()
    if name in oracles:
        want = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = value_hash(got) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status} {name}: rows {len(got)}/{len(want)} cols_match={ok_cols} hash_match={ok_hash} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            fails.append(name)
    else:
        print(f"ROWS-ONLY {name}: rows={len(got)} ({time.time()-t0:.1f}s)")

print("RESULT:", "FAIL " + ",".join(fails) if fails else "ALL OK")
spark.stop()
sys.exit(1 if fails else 0)
