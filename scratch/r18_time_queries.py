"""r18 A/B timing probe: time named registry queries with the noop sink.

Usage: python scratch/r18_time_queries.py <repo_root> <reps> <name> [name...]
Prints one JSON line {name: [per-rep seconds...]}.

The caller alternates repo_root between the live tree and the
round-start worktree (/tmp/r18_before) in back-to-back processes,
several pairs, and compares per-variant MINS — the process-interleave
variant of the r17 "interleave in one window" discipline (the shared
VM's host band swings slowly relative to a pair of runs; pairs that
disagree with their neighbors are re-run).
"""
import gc
import json
import sys
import time

repo = sys.argv[1]
reps = int(sys.argv[2])
names = sys.argv[3:]
sys.path.insert(0, repo)

import os  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

qs = entrymod.queries()
spark = get_spark(app_name="r18-ab")
spark.range(1).count()

# warm the train-once memos so per-query numbers match the bench's
# warm-series regime (cold cost is measured separately by
# scratch/r18_train_profile.py)
out: dict[str, list[float]] = {n: [] for n in names}
for _ in range(reps):
    for n in names:
        t0 = time.perf_counter()
        qs[n](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        out[n].append(round(time.perf_counter() - t0, 3))
        gc.collect()
        spark.catalog.clearCache()
print(json.dumps(out))
spark.stop()
