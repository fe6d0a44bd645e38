"""A/B: seed vs Lloyd-trained codebook on the PRODUCTION PQ path (r15,
VERDICT r14 #1).

Measures, at $SPARK_GRAFT_SF_DIR (default sf0.1):
  1. pq_adc_topk wall time under SPARK_GRAFT_PQ_SEED=1 (seed) vs
     unset (trained, production) — cold-ish first call + warm call,
     so the one-time training cost and the steady-state encode cost
     are visible separately (the memoized trainer amortizes across
     every PQ consumer in a session).
  2. The retrieval-quality delta from pq_recall_report (mean
     recall@TOPK per variant — "trained" IS the production path).

Run:  python scratch/pq_trained_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    from mapreduceinfrastructure_spark.operators import similarity as sim

    for label, env in (("seed", "1"), ("trained", "")):
        if env:
            os.environ[sim.PQ_SEED_ENV] = env
        else:
            os.environ.pop(sim.PQ_SEED_ENV, None)
        sim.pq_train_cache_reset()
        t0 = time.time()
        n = sim.pq_adc_topk(spark, sf).count()
        cold = time.time() - t0
        t0 = time.time()
        sim.pq_adc_topk(spark, sf).count()
        warm = time.time() - t0
        print(
            f"pq_adc_topk[{label}]: rows={n} "
            f"cold={cold:.2f}s warm={warm:.2f}s",
            flush=True,
        )

    os.environ.pop(sim.PQ_SEED_ENV, None)
    rep = sim.pq_recall_report(spark, sf).toPandas()
    m = rep.groupby("variant")["recall"].mean()
    print(
        f"mean recall@{sim.TOPK}: seed={m['seed']:.3f} "
        f"trained(production)={m['trained']:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
