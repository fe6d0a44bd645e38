import sys, time
sys.path.insert(0, "/root/repo")
from mapreduceinfrastructure_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark(app_name="dedup-ab")
qs = e.queries()
sf = "/root/testdata/sf0.1"
import gc
for name in ("prefix_filter_neardup", "ppjoin_neardup", "cluster_diameter"):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, sf).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
        gc.collect(); spark.catalog.clearCache()
    print(f"{name}: min {min(ts):.2f}  all {[round(t,2) for t in ts]}")
spark.stop()
