"""Skew stress: the salting pattern's load-spreading contract, proven
on a synthetic hot key rather than inferred from the plan.

`advanced.salted_join` pins the plan shape (ShuffledHashJoin on
(key, salt)); this file pins the REASON the pattern exists: a key
owning half the input lands in exactly one reducer partition when
hash-partitioned on the bare key, and spreads across all salt buckets
when partitioned on (key, salt).  At 100 TB the difference is one task
processing 50 TB versus 8 tasks processing ~6 TB each.
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_ROWS = 200_000
HOT_KEY = 7
N_SALT = 8
N_PARTS = 32


def _skewed_fact(spark):
    # half the rows on HOT_KEY, the rest spread over ~997 keys
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
        .otherwise((F.col("id") % 997) + 1000)
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_hot_key_occupies_one_partition_unsalted(spark):
    fact = _skewed_fact(spark)
    parts = (
        fact.repartition(N_PARTS, "k")
        .filter(F.col("k") == HOT_KEY)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts == 1  # the problem: 100k rows -> one reducer


def test_salt_spreads_hot_key_across_buckets(spark):
    fact = _skewed_fact(spark).withColumn(
        "salt", F.pmod(F.xxhash64("v"), F.lit(N_SALT))
    )
    hot = fact.filter(F.col("k") == HOT_KEY)
    # every salt bucket is populated (xxhash64 spreads v uniformly)
    assert hot.select("salt").distinct().count() == N_SALT
    by_part = (
        fact.repartition(N_PARTS, "k", "salt")
        .filter(F.col("k") == HOT_KEY)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    total_hot = sum(r["count"] for r in by_part)
    assert total_hot == N_ROWS // 2
    # spread over >= N_SALT/2 distinct partitions ((k, salt) pairs can
    # collide in the 32-way partitioner), and no partition holds more
    # than ~2 buckets' worth
    assert len(by_part) >= N_SALT // 2
    assert max(r["count"] for r in by_part) <= (total_hot // N_SALT) * 2 + 1


def test_salted_join_equals_unsalted_join(spark):
    """The salt must be semantics-free: replicating the dim side per
    salt and joining on (key, salt) returns exactly the unsalted
    result."""
    fact = _skewed_fact(spark).withColumn(
        "salt", F.pmod(F.xxhash64("v"), F.lit(N_SALT))
    )
    dim = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
    )
    dim_rep = dim.withColumn(
        "salt",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)).cast("array<long>")),
    )
    salted = (
        fact.hint("SHUFFLE_HASH")
        .join(dim_rep, ["k", "salt"])
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("attr").alias("s"))
    )
    unsalted = (
        _skewed_fact(spark)
        .join(dim, "k")
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("attr").alias("s"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, unsalted.collect())
    )
