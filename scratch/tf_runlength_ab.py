"""A/B: in-row per-distinct-word tf — r13 filter-scan (per distinct
word, F.filter scans the FULL token array: O(distinct x length) per
doc) vs the r14 run-length form (array_sort + run-start positions +
adjacent-start differences: O(L log L + distinct)).

Backs the streaming_index_ingest rework (VERDICT r13 #6).  Both shapes
produce the identical (word, tf) multiset, so the downstream
vocabulary agg is unchanged; forcing evaluation must go through a SUM
over the agg values (a bare count() lets Catalyst prune the tf
expression entirely and both arms read falsely flat).

Measured (local[32], 32 docs per arm, min-of-2 warm):
  L=4000  d=400  : old 0.77 s  new 0.65 s
  L=16000 d=1600 : old 5.75 s  new 0.66 s   (8.7x)
  (L=64000 d=6400: old exceeded the probe timeout; new stays flat)

Run: python scratch/tf_runlength_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapreduceinfrastructure_spark import session  # noqa: E402


def build(spark, L, d, docs=32):
    doc = " ".join(f"w{(i * 7919) % d}" for i in range(L))
    return (
        spark.range(docs)
        .select(F.split(F.lit(doc), " ").alias("t"))
        .localCheckpoint()
    )


def old_pairs(df):
    return df.select(
        "t", F.explode(F.array_distinct("t")).alias("word")
    ).select(
        "word",
        F.size(F.filter("t", lambda x: x == F.col("word")))
        .cast("long")
        .alias("tf"),
    )


def new_pairs(df):
    s = df.select(F.array_sort("t").alias("s"))
    runs = s.select(
        "s",
        F.when(F.size("s") == 0, F.array().cast("array<int>"))
        .otherwise(
            F.filter(
                F.sequence(F.lit(1), F.size("s")),
                lambda i: (i == F.lit(1))
                | (
                    F.element_at(F.col("s"), i)
                    != F.try_element_at(F.col("s"), i - 1)
                ),
            )
        )
        .alias("st"),
    )
    return runs.select(
        F.explode(
            F.transform(
                "st",
                lambda sp, k: F.struct(
                    F.element_at(F.col("s"), sp).alias("word"),
                    (
                        F.coalesce(
                            F.try_element_at(F.col("st"), k + F.lit(2)),
                            F.size("s") + 1,
                        )
                        - sp
                    )
                    .cast("long")
                    .alias("tf"),
                ),
            )
        ).alias("wt")
    ).select("wt.word", "wt.tf")


def force(p):
    return (
        p.groupBy("word")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("tf_total"))
        .select(F.sum(F.col("df") + F.col("tf_total")).alias("z"))
        .collect()[0]["z"]
    )


def main():
    spark = session.get_spark("tf_runlength_ab")
    for L, d in [(4000, 400), (16000, 1600)]:
        df = build(spark, L, d)
        out, sums = [], set()
        for name, fn in (("old", old_pairs), ("new", new_pairs)):
            sums.add(force(fn(df)))  # warm + checksum
            ts = []
            for _ in range(2):
                t0 = time.monotonic()
                force(fn(df))
                ts.append(time.monotonic() - t0)
            out.append(f"{name}={min(ts):.3f}s")
        assert len(sums) == 1, sums
        print(f"L={L} d={d}: " + " ".join(out) + " (checksums match)")
    spark.stop()


if __name__ == "__main__":
    main()
