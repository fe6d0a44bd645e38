"""Format round-trips, partitioned/bucketed sinks, stateful streaming,
and robustness-parity session conf."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.sinks.formats import (
    read_csv,
    read_json,
    write_bucketed_table,
    write_csv,
    write_json,
    write_partitioned_parquet,
)
from mapreduceinfrastructure_spark.sources.tables import load_table


def _nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_round_trip(spark, sf_dir, tmp_path):
    nation = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, "n_nationkey int, n_name string, n_regionkey int")
    assert sorted(back.collect()) == sorted(nation.collect())


def test_json_round_trip(spark, sf_dir, tmp_path):
    nation = _nation(spark, sf_dir)
    path = str(tmp_path / "nation_json")
    write_json(nation, path)
    back = read_json(spark, path, "n_nationkey int, n_name string, n_regionkey int")
    assert sorted(back.select("n_nationkey", "n_name", "n_regionkey").collect()) == sorted(
        nation.collect()
    )


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders.withColumn("yr", F.year("o_orderdate")), path, "yr")
    # hive layout exists
    assert glob.glob(f"{path}/yr=*"), "no partition dirs"
    back = spark.read.parquet(path).filter(F.col("yr") == 1997)
    # partition pruning: only the yr=1997 dir is scanned
    from mapreduceinfrastructure_spark.plans.explain import formatted_plan

    assert back.count() == orders.filter(F.year("o_orderdate") == 1997).count()
    assert "PartitionFilters: [isnotnull(yr#" in formatted_plan(back) or "yr=1997" in formatted_plan(back)


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    from mapreduceinfrastructure_spark.plans.explain import shuffle_count

    orders = load_table(spark, sf_dir, "orders").limit(1000)
    write_bucketed_table(orders, "orders_b", "o_custkey", 4)
    t = spark.table("orders_b")
    joined = t.alias("a").join(t.alias("b"), "o_custkey")
    # bucketed-on-key self join: no exchange needed on either side
    assert shuffle_count(joined) == 0
    assert joined.count() > 0


def test_stateful_streaming_profiles(spark, sf_dir):
    from mapreduceinfrastructure_spark.streaming.event_stream import (
        read_events_stream,
        run_stream_to_memory,
    )
    from mapreduceinfrastructure_spark.streaming.stateful import streaming_user_profiles

    raw = read_events_stream(spark, sf_dir)
    out = run_stream_to_memory(
        spark, streaming_user_profiles(raw), "profiles", output_mode="update"
    )
    rows = {r["user_id"]: r for r in out.collect()}
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
    )
    for b in batch.collect():
        assert rows[b["user_id"]]["n_events"] == b["n"]
        assert abs(rows[b["user_id"]]["total_value"] - b["tv"]) < 0.02


def test_robustness_parity_conf(spark):
    """The reference's straggler/failure machinery (master.h:217-256) as
    Spark conf — assert the session actually carries it."""
    assert spark.conf.get("spark.task.maxFailures") == "4"
    # r17: speculation is master-resolved — OFF under local[*] (a
    # speculative copy on the same host only duplicates the straggler's
    # compute on the CPUs the tail is contending for; measured
    # kcore_peel 4.14 -> 2.71 s at sf0.1), ON for any non-local master
    # (the reference's 10 s straggler-deadline parity, master.h:19),
    # SPARK_GRAFT_SPECULATION forcing either way.  ADVICE r17: assert
    # the HARD local default — mirroring the env override made the
    # test tautological — and skip when an environment pins the force.
    import os as _os

    if _os.environ.get("SPARK_GRAFT_SPECULATION") is not None:
        pytest.skip("SPARK_GRAFT_SPECULATION pinned by the environment")
    assert spark.conf.get("spark.speculation") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_compact_parquet_merges_small_files(spark, sf_dir, tmp_path):
    import os

    from mapreduceinfrastructure_spark.sinks.formats import compact_parquet

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(src)  # 64 tiny files
    n = compact_parquet(spark, src, out, target_mb=128)
    assert n == 1  # sf0.01 orders ≪ 128 MB
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == n
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round trip preserves rows exactly, and a filter on the ORC
    scan is pushed down (PushedFilters in the scan node) like parquet."""
    from mapreduceinfrastructure_spark.sinks.formats import read_orc, write_orc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    p = str(tmp_path / "orders_orc")
    write_orc(orders, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))
    filtered = back.filter(back.o_orderstatus == "F")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:120], plan
