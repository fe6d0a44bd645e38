"""A/B: the r16 residual-frame memo (ADVICE r15; SCALE.md "r16
ivf_pq_rerank_topk" addendum).

Measures the wall-clock of a second residual consumer in the same
session in two shapes at $SPARK_GRAFT_SF_DIR (default sf0.1):

  1. memo OFF (control) — _RESIDUAL_FRAME_CACHE cleared between the
     two consumers, so the second one re-derives AND re-materializes
     the residual frame (the r15 shipped behavior, modulo eagerness),
  2. memo ON (shipped)  — the second consumer reuses the
     localCheckpointed frame the first one materialized.

Both legs run the SAME pair of consumers (ivf_pq_adc_topk first,
then a full ivf_pq_residual collect) with the PQ train memo left
warm in BOTH legs, so the delta isolates the frame materialization —
not codebook training (that memo predates r16 and is not under test).

Recorded r16 numbers on the build VM (sf0.1): control second-consumer
2.45 s vs memo 0.38 s (6.5x); drive_verify showed the same effect at
sf0.01 with cold train memos (22.5 s -> 1.1 s incl. session overhead).

Run:  python scratch/residual_memo_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def second_consumer_sec(sim, spark, clear_between: bool) -> float:
    """First consumer warms (or not) the frame; time the second."""
    sim._RESIDUAL_FRAME_CACHE.clear()
    sim.ivf_pq_adc_topk(spark, SF_DIR).count()  # first consumer
    if clear_between:
        sim._RESIDUAL_FRAME_CACHE.clear()
    t0 = time.time()
    sim.ivf_pq_residual(spark, SF_DIR).count()  # second consumer
    return time.time() - t0


def main() -> None:
    spark = get_spark()
    from mapreduceinfrastructure_spark.operators import similarity as sim

    # warm the train memos once so neither leg pays codebook training
    sim.ivf_pq_adc_topk(spark, SF_DIR).count()

    control = second_consumer_sec(sim, spark, clear_between=True)
    memo = second_consumer_sec(sim, spark, clear_between=False)
    print(
        f"second residual consumer at {SF_DIR}: "
        f"memo OFF {control:.2f}s  memo ON {memo:.2f}s  "
        f"({control / max(memo, 1e-9):.1f}x)"
    )


if __name__ == "__main__":
    main()
