"""Relational query patterns over the TPC-H-ish tables (SURVEY.md §2.2/2.3).

The reference expresses all of these through its map/emit + reduce/emit
programming model (external/include/mr_task_factory.h:20,37) — per-key
aggregation, repartition joins, histograms, top-k, distributed sort are
the OSDI'04 §2.1 pattern catalog.  Here each is a declarative DataFrame
plan so Catalyst picks partial aggregation, join strategy (broadcast for
the small dims), pushdown and pruning.

Scale notes (100 TB design point):
- Dim joins (nation/region/supplier) are explicitly broadcast — no
  shuffle of the fact table for them at any scale.
- All aggregations are algebraic → map-side partial agg halves shuffle.
- ``global_rank`` shows the scalable two-pass distributed-sort rank
  (range partition + per-partition offsets) instead of a single-window
  ``row_number`` over everything, which would serialize on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import event_ts_us, load_table


# --- per-key aggregation (OSDI: URL access frequency / per-key stats) ---

def key_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key count: orders per customer (map: emit (custkey,1); reduce: sum)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))


def key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key fold over several measures — the "mean-max temperature"
    pattern (description.md:43), TPC-H Q1-shaped pricing summary."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
            F.count("*").alias("count_order"),
        )
    )


def select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection + projection (any map that drops/reshapes fields).
    Filter + column arithmetic pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.05) & (F.col("l_quantity") > 40))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
    )


def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram / binning: map emits (bucket(v), 1); reduce sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_quantity") / 5).cast("long").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: parts and suppliers per return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --- joins (the MR repartition-join idiom, Catalyst-planned) ---

def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way repartition join: customer ⋈ orders ⋈ nation ⋈ region.

    nation/region are broadcast (25 / 5 rows at every scale factor) —
    only the customer⋈orders join shuffles, on the join key.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers that have at least one order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no urgent orders.

    (Every customer has *some* order in the synthetic data, so the
    predicate filters to urgent-priority orders to keep the anti set
    non-empty and the check meaningful.)
    """
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


def edge_inversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse-link pattern (OSDI §2.1): invert order→customer edges into
    customer→[orders] adjacency, sorted for determinism."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("o_orderkey")), lambda x: x.cast("string")),
                ",",
            ).alias("orderkeys")
        )
    )


# --- set operations ---

def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: positive-balance customers that actually ordered."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rich = customer.filter(F.col("c_acctbal") > 1000).select(
        F.col("c_custkey").alias("custkey")
    )
    ordering = orders.select(F.col("o_custkey").alias("custkey"))
    return rich.intersect(ordering)


# --- sort / top-k / windows ---

def distributed_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed sort (OSDI §2.1): global orderBy = range partition +
    local sort (RangePartitioner), the scalable version of the
    reference's per-reducer sorted output (description.md:62)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.orderBy("l_orderkey", "l_linenumber").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable global rank: two-pass distributed sort-rank.

    A naive ``row_number() OVER (ORDER BY ...)`` collapses to a single
    partition.  The scale path: range-partition on the sort key, local
    row_number within each sorted partition, then add per-partition
    offsets (prefix sums over partition counts — a tiny driver-side
    window over ~#partitions rows, broadcast back).  Width comes from
    the cluster (``session.two_pass_rank_width``), not a constant.
    """
    from ..session import two_pass_rank_width

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    ranged = part.repartitionByRange(
        two_pass_rank_width(spark), "p_retailprice", "p_partkey"
    ).sortWithinPartitions("p_retailprice", "p_partkey")
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy("p_retailprice", "p_partkey")
    local = with_pid.withColumn("_local_rn", F.row_number().over(w_local))
    # per-partition counts → cumulative offsets (tiny: one row per partition)
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
    return (
        local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .select(
            "p_partkey",
            "p_retailprice",
            (F.col("_local_rn") + F.col("_off")).cast("long").alias("rnk"),
        )
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer (deterministic tie-break on key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rn")
    )


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 lineitems by extended price (TakeOrderedAndProject —
    per-partition top-k then merge on the driver; no full sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice"))
        .limit(10)
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (ordered window aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total) over flag/status."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"), F.count("*").alias("cnt"))
    )


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status (statuses O/F/P)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --- sessionization over the events stream table ---

def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at >30-min gaps.

    The MR formulation needs a stateful reduce over ts-sorted events;
    here it is lag + cumulative sum of session-break flags — two window
    passes over the same (user_id, ts) partitioning, one shuffle total.
    """
    # All session math is integer epoch-microseconds; event_ts_us adapts
    # to whichever physical ts layout the parquet carries.
    events = load_table(spark, sf_dir, "events")
    events = events.withColumn("ts_us", event_ts_us(events))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    gap_us = 1_800_000_000  # 30 min
    is_break = F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1).otherwise(0)
    with_sess = (
        events.withColumn("_brk", is_break)
        .withColumn(
            "session_id",
            F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
    )
