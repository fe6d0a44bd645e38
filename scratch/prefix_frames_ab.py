"""A/B: _prefix_frames pipeline — 4-exchange (distinct -> dfreq agg ->
join -> doc agg) vs 2-exchange (one explicit shingle repartition that
the local distinct, the df agg, and the df join all reuse, then the doc
agg).  Run each variant FIRST in a fresh session (order-controlled,
same discipline as scratch/dedup_ab.py): SPARK_AB_VARIANT=old|new.

Measures: by_doc materialization (count) and end-to-end
ppjoin_pairs_raw + pagerank_docs at sf0.1, min of N reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VARIANT = os.environ.get("SPARK_AB_VARIANT", "new")
REPS = int(os.environ.get("SPARK_AB_REPS", "3"))


def old_prefix_frames(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        _shingles,
    )

    sh = _shingles(spark, sf_dir)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    by_doc = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "shingle"))).alias("s"))
        .select("doc_id", F.size("s").cast("long").alias("n"), "s")
        .persist()
    )
    prefix_len = (
        F.col("n") - F.ceil(F.lit(PREFIX_JACCARD_T) * F.col("n")) + 1
    ).cast("int")
    pref = by_doc.select(
        "doc_id", "n",
        F.posexplode(F.slice("s", F.lit(1), prefix_len)).alias("p", "e"),
    ).select(
        "doc_id", F.col("e.shingle").alias("shingle"),
        (F.col("p") + 1).cast("long").alias("rn"), "n",
    )
    return by_doc, pref


def main() -> None:
    spark = get_spark()
    import gc

    from mapreduceinfrastructure_spark.operators import dedup as dd
    from mapreduceinfrastructure_spark.operators import graph as gr

    if VARIANT == "old":
        dd._prefix_frames = lambda s, d: old_prefix_frames(s, d)

    # stage A: by_doc materialize + candidate count + full ppjoin + pagerank
    for name, fn in [
        ("ppjoin_pairs", lambda: dd.ppjoin_pairs_raw(spark, SF).count()),
        ("pagerank_docs", lambda: gr.pagerank_docs(spark, SF).count()),
    ]:
        times = []
        for _ in range(REPS):
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn()
            times.append(time.time() - t0)
        print(f"{VARIANT} {name}: n={n} min={min(times):.2f}s all={[round(t,2) for t in times]}")


if __name__ == "__main__":
    main()
