"""r17 optimization-round profiler: for each headline bench query,
measure (a) Python-side plan-construction time (py4j/driver), (b)
noop-sink execution time, (c) job/stage counts and per-stage metrics
(shuffle read/write bytes, task counts, executor run time) via the
Spark UI REST API — the guide §1 "measure first" pass, recorded once
before any change.

Run: python scratch/r17_profile.py [query ...]   (default: full list)
Writes scratch/r17_profile.json.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main():
    names = sys.argv[1:] or bench.HEADLINE
    qs = entrymod.queries()
    spark = get_spark(
        app_name="mri-r17-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    spark.range(1).count()
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    out = {}
    for name in names:
        if name not in qs:
            continue
        sc.setJobGroup(name, name)
        # warm run 1 (memo/JIT warm-up), then measured run
        rec = {}
        for leg in ("cold", "warm"):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            rec[leg] = {
                "build_sec": round(t1 - t0, 3),
                "exec_sec": round(t2 - t1, 3),
            }
            gc.collect()
            spark.catalog.clearCache()
        # jobs for this group (both legs)
        jobs = [j for j in rest(f"{base}/jobs") if j.get("jobGroup") == name]
        rec["n_jobs_2legs"] = len(jobs)
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        stages = []
        for sid in stage_ids:
            try:
                for att in rest(f"{base}/stages/{sid}"):
                    stages.append(
                        {
                            "id": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "tasks": att["numCompleteTasks"],
                            "runtime_ms": att["executorRunTime"],
                            "cpu_ms": att.get("executorCpuTime", 0) // 1_000_000,
                            "sh_read_mb": round(att["shuffleReadBytes"] / 1e6, 2),
                            "sh_write_mb": round(att["shuffleWriteBytes"] / 1e6, 2),
                            "input_mb": round(att["inputBytes"] / 1e6, 2),
                        }
                    )
            except Exception:
                pass
        stages.sort(key=lambda s: -s["runtime_ms"])
        rec["n_stages_2legs"] = len(stages)
        rec["top_stages"] = stages[:8]
        rec["sum_runtime_ms"] = sum(s["runtime_ms"] for s in stages)
        rec["sum_sh_write_mb"] = round(sum(s["sh_write_mb"] for s in stages), 2)
        out[name] = rec
        print(
            f"{name}: build {rec['cold']['build_sec']}/{rec['warm']['build_sec']}s "
            f"exec {rec['cold']['exec_sec']}/{rec['warm']['exec_sec']}s "
            f"jobs(2legs) {rec['n_jobs_2legs']} stages {rec['n_stages_2legs']} "
            f"task-runtime {rec['sum_runtime_ms']}ms shW {rec['sum_sh_write_mb']}MB",
            flush=True,
        )
        sc.setJobGroup("idle", "idle")

    with open("/root/repo/scratch/r17_profile.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
