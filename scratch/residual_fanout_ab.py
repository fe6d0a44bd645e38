"""A/B: the r15 residual-training partitioning fix (SCALE.md "r15
residual training was single-core").

Measures ONE PQ training pass (codes + posexplode + per-(code, pos)
mean agg) over the residual frame in three shapes at
$SPARK_GRAFT_SF_DIR (default sf0.1):

  1. raw          — as derived (AQE coalesces the post-agg residual
                    frame to 1 partition at test row counts, so the
                    fold-heavy pass serializes onto one core),
  2. checkpointed — localCheckpoint only (proves the cost is NOT
                    expression re-evaluation: partitioning persists),
  3. fanned       — fan_out to defaultParallelism (the shipped
                    _residual_frame shape).

Recorded r15 numbers on the build VM: 71 s / 88 s / 14 s.

Run:  python scratch/residual_fanout_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark.functions.vector import (  # noqa: E402
    lit_double_array,
)
from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402
from mapreduceinfrastructure_spark.sources.tables import fan_out  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def one_pass(sim, rv, codes, flat):
    cs = sim._pq_code_arr(lit_double_array(flat), len(codes))
    t0 = time.time()
    (
        rv.select(cs.alias("cs"), F.posexplode("v").alias("pos", "x"))
        .select(
            F.element_at(
                "cs", (F.col("pos") / sim.PQ_SUBDIM).cast("int") + 1
            ).alias("code"),
            "pos",
            "x",
        )
        .groupBy("code", "pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    return time.time() - t0


def main() -> None:
    spark = get_spark()
    from mapreduceinfrastructure_spark.operators import similarity as sim

    assign, cents = sim.ivf_assignments(spark, SF_DIR)
    res = assign.join(F.broadcast(cents), "cid").select(
        "vec_id",
        "cid",
        F.zip_with("v", "cv", lambda x, y: x - y).alias("rv"),
    )
    shapes = {
        "raw": res,
        "checkpointed": res.localCheckpoint(eager=True),
        "fanned": fan_out(res, spark),
    }
    for label, frame in shapes.items():
        rv = frame.select("vec_id", F.col("rv").alias("v"))
        codes, flat = sim._pq_collect_codebook(rv)
        print(
            f"{label}: partitions={frame.rdd.getNumPartitions()} "
            f"one_pass={one_pass(sim, rv, codes, flat):.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
