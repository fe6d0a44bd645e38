"""r18: dedup_clusters plan-size / wall A/B for the pre-jump
persist -> lazy-localCheckpoint change (VERDICT r17 #6).

Usage: python scratch/r18_cc_plan_ab.py <repo_root> [sf_dir]
Prints the final plan size and 3 noop-timed runs.
"""
import sys
import time

repo = sys.argv[1]
sys.path.insert(0, repo)
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402
import __spark_entry__ as e  # noqa: E402

spark = get_spark(app_name="r18-cc-ab")
spark.range(1).count()
qs = e.queries()
for rep in range(3):
    t0 = time.perf_counter()
    df = qs["dedup_clusters"](spark, SF)
    t_build = time.perf_counter() - t0
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t_exec = time.perf_counter() - t0
    print(
        f"rep{rep}: build {t_build:.3f}s exec {t_exec:.3f}s "
        f"plan_chars {len(plan)}",
        flush=True,
    )
spark.stop()
