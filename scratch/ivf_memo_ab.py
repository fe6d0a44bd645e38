"""A/B: the r16 coarse-quantizer memo (SCALE.md "r16 ivf_assignments
memo").

Measures the wall-clock of a second IVF consumer in the same session
in two shapes at $SPARK_GRAFT_SF_DIR (default sf0.1):

  1. memo OFF (control) — _IVF_ASSIGN_CACHE cleared between the two
     consumers, so the second re-runs the whole Lloyd recurrence
     (LLOYD_ITERATIONS corpus argmin passes + per-iteration
     K x EMBED_DIM centroid collects + eager checkpoints),
  2. memo ON (shipped)  — the second consumer reuses the trained
     quantizer (checkpointed centroids + the assignment plan).

Both legs run the SAME pair of consumers (ann_ivf first, then a full
ann_ivf_adc count) with the PQ train and residual memos cleared in
BOTH legs before the pair, so the delta isolates quantizer training
only from the shared-artifact effects already A/B'd elsewhere
(scratch/residual_memo_ab.py, scratch/pq_trained_ab.py).

Recorded r16 numbers on the build VM (sf0.1): see SCALE.md.

Run:  python scratch/ivf_memo_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def second_consumer_sec(sim, spark, clear_between: bool) -> float:
    sim._IVF_ASSIGN_CACHE.clear()
    sim._RESIDUAL_FRAME_CACHE.clear()
    sim._PQ_TRAIN_CACHE.clear()
    sim.ann_ivf(spark, SF_DIR).count()  # first consumer trains
    if clear_between:
        sim._IVF_ASSIGN_CACHE.clear()
    t0 = time.time()
    sim.ann_ivf_adc(spark, SF_DIR).count()  # second consumer
    return time.time() - t0


def main() -> None:
    spark = get_spark()
    from mapreduceinfrastructure_spark.operators import similarity as sim

    # one throwaway pair so JVM/codegen warmup doesn't land in leg 1
    sim.ann_ivf(spark, SF_DIR).count()

    control = second_consumer_sec(sim, spark, clear_between=True)
    memo = second_consumer_sec(sim, spark, clear_between=False)
    print(
        f"second IVF consumer at {SF_DIR}: "
        f"memo OFF {control:.2f}s  memo ON {memo:.2f}s  "
        f"({control / max(memo, 1e-9):.1f}x)"
    )


if __name__ == "__main__":
    main()
