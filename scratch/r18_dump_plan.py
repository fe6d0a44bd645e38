"""Dump `.explain("formatted")` for named queries to
/root/repo/plans/r18/<name>_<suffix>.txt  (suffix = argv[1], names = argv[2:]).

Run: python scratch/r18_dump_plan.py before ann_ivf ...
Imports the repo that CONTAINS THIS FILE (so a git-worktree copy at the
round-start commit dumps the true "before" plans).  Uses sf0.01 like
scripts/dump_plans.py (plan SHAPE is SF-invariant for these operators;
the size-switched ones take the same branch at both local SFs).
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

suffix = sys.argv[1]
names = sys.argv[2:]
qs = entrymod.queries()
spark = get_spark(app_name="mri-r18-plans")
os.makedirs("/root/repo/plans/r18", exist_ok=True)
for name in names:
    df = qs[name](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = f"/root/repo/plans/r18/{name}_{suffix}.txt"
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan)} chars)", flush=True)
spark.stop()
