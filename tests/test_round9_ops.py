"""Cross-checks for the round-9 operators beyond oracle parity, plus
pins for the round-9 fixes (delta-frontier BFS early exit, kcore action
cut, star_contraction loud non-convergence, scratch cleanup)."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

QUERIES = entrymod.queries()


# ---------------------------------------------------------------- ohlc


def test_ohlc_bars_match_window_formulation(spark, sf_dir):
    """The struct-min/max argmin picks must equal an INDEPENDENT
    formulation: first/last value by (ts_us, event_id) via window
    functions over the same buckets — a genuinely different physical
    path (sorted window vs algebraic agg) computing the same bars."""
    from mapreduceinfrastructure_spark.operators.timeseries import (
        HOUR_US,
        _events_us,
    )

    got = {
        (r["event_type"], r["bucket_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in QUERIES["ohlc_bars"](spark, sf_dir).collect()
    }
    e = _events_us(spark, sf_dir).withColumn(
        "bucket_us", F.col("ts_us") - F.col("ts_us") % HOUR_US
    )
    w = Window.partitionBy("event_type", "bucket_us").orderBy(
        "ts_us", "event_id"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    want_df = (
        e.select(
            "event_type",
            "bucket_us",
            F.first("value").over(wfull).alias("open"),
            F.last("value").over(wfull).alias("close"),
            F.max("value").over(wfull).alias("high"),
            F.min("value").over(wfull).alias("low"),
            F.count("*").over(wfull).alias("n"),
        )
        .dropDuplicates(["event_type", "bucket_us"])
        .collect()
    )
    want = {
        (r["event_type"], r["bucket_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in want_df
    }
    assert got == want
    assert all(lo <= op <= hi and lo <= cl <= hi for op, hi, lo, cl, _ in got.values())


# ---------------------------------------------------------------- scd2


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    """Run semantics checked structurally: per user, runs ordered by
    start_us tile the event stream (counts sum to the user's events),
    consecutive runs always change event_type, and run intervals never
    overlap (end < next start is allowed to touch equal timestamps
    only across different runs of the tie-broken order)."""
    rows = QUERIES["scd2_intervals"](spark, sf_dir).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    from mapreduceinfrastructure_spark.operators.timeseries import _events_us

    totals = {
        r["user_id"]: r["n"]
        for r in _events_us(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for uid, runs in by_user.items():
        runs.sort(key=lambda r: r["run_idx"])
        assert [r["run_idx"] for r in runs] == list(range(1, len(runs) + 1))
        assert sum(r["n_events"] for r in runs) == totals[uid]
        for a, b in zip(runs, runs[1:]):
            assert a["event_type"] != b["event_type"], (uid, a, b)
            assert a["start_us"] <= a["end_us"] <= b["start_us"]


# ------------------------------------------------------- market basket


def test_market_basket_rule_identities(spark, sf_dir):
    """Agrawal-Srikant identities on the emitted trio: lift is
    symmetric under rule reversal (n_both and the denominator product
    are), confidence(a→c) · n_a = confidence(c→a) · n_c = n_both, and
    support · n_orders recovers the integer pair count."""
    from mapreduceinfrastructure_spark.operators.graph import COPURCHASE_MIN_W
    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = QUERIES["market_basket_rules"](spark, sf_dir).collect()
    assert rows
    n_orders = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    rules = {(r["antecedent"], r["consequent"]): r for r in rows}
    for (a, c), r in rules.items():
        assert r["n_both"] >= COPURCHASE_MIN_W
        assert abs(r["support"] * n_orders - r["n_both"]) < 1e-6
        rev = rules.get((c, a))
        assert rev is not None, "directed rules must come in both orders"
        assert rev["n_both"] == r["n_both"]
        assert abs(rev["lift"] - r["lift"]) < 1e-9 * max(1.0, r["lift"])
        # conf(a→c) = n_both/n_a and rev.conf/rev.lift = n_a/n_orders,
        # so conf · (rev.conf/rev.lift) · n_orders recovers n_both
        assert abs(
            r["confidence"] * rev["confidence"] / rev["lift"] * n_orders
            - r["n_both"]
        ) < 1e-6


def test_market_basket_spot_check_vs_pandas(spark, sf_dir, duck):
    """One antecedent's rules recomputed end-to-end in DuckDB-free
    pandas from the raw parquet."""
    import pandas as pd

    li = pd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    ).drop_duplicates()
    rows = QUERIES["market_basket_rules"](spark, sf_dir).collect()
    ant = rows[0]["antecedent"]
    got = {r["consequent"]: r for r in rows if r["antecedent"] == ant}
    orders_with_a = set(li[li.l_partkey == ant].l_orderkey)
    n_a = len(orders_with_a)
    n_orders = li.l_orderkey.nunique()
    both = li[li.l_orderkey.isin(orders_with_a) & (li.l_partkey != ant)]
    counts = both.groupby("l_partkey").l_orderkey.nunique()
    from mapreduceinfrastructure_spark.operators.graph import COPURCHASE_MIN_W

    want = counts[counts >= COPURCHASE_MIN_W]
    assert set(got) == set(want.index)
    for pk, n_both in want.items():
        r = got[pk]
        n_c = li[li.l_partkey == pk].l_orderkey.nunique()
        assert r["n_both"] == n_both
        assert abs(r["confidence"] - n_both / n_a) < 1e-12
        assert abs(r["lift"] - n_both * n_orders / (n_a * n_c)) < 1e-9


# ------------------------------------------------- round-9 fix pins


def test_delta_frontier_bfs_clique_one_round(spark):
    """VERDICT r8 #6 'done' gate: a diameter-1 clique drains the
    frontier in ONE expansion round (the old shape always paid the
    full hop cap), and the distances are exactly the clique's."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        DIAMETER_HOP_CAP,
        _capped_pair_distances,
    )

    n = 5
    edges = [(a, b) for a in range(n) for b in range(n) if a != b]
    und = spark.createDataFrame(edges, schema="a long, b long")
    dist = {(r["a"], r["b"]): r["d"] for r in _capped_pair_distances(und, DIAMETER_HOP_CAP).collect()}
    assert _capped_pair_distances.last_rounds == 1
    assert dist == {(a, b): 1 for a, b in edges}


def test_delta_frontier_bfs_path_distances(spark):
    """A 5-node path: min-hop distances are exact up to the cap, pairs
    beyond the cap are absent, and the loop ran exactly the rounds the
    deepest reached level needed."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        _capped_pair_distances,
    )

    path = [(i, i + 1) for i in range(4)]
    sym = path + [(b, a) for a, b in path]
    und = spark.createDataFrame(sym, schema="a long, b long")
    dist = {(r["a"], r["b"]): r["d"] for r in _capped_pair_distances(und, 3).collect()}
    for a in range(5):
        for b in range(5):
            want = abs(a - b)
            if 1 <= want <= 3:
                assert dist[(a, b)] == want, (a, b)
            else:
                assert (a, b) not in dist
    # cap=3 runs expansions k=2 and k=3, then the range (not a drain
    # round) ends the loop — exactly 2 rounds, never a wasted one
    assert _capped_pair_distances.last_rounds == 2


def test_star_contraction_raises_on_round_cap(spark):
    """ADVICE r8: exhausting max_rounds without a verified fixpoint
    must fail loudly, never silently label from a non-converged edge
    set."""
    from mapreduceinfrastructure_spark.operators.graph import star_contraction

    chain = [(i, i + 1) for i in range(12)]
    sym = chain + [(b, a) for a, b in chain]
    und = spark.createDataFrame(sym, schema="a long, b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        star_contraction(und, max_rounds=1)
    # and with the real cap the same graph converges to one component
    lbl = star_contraction(und).collect()
    assert {r["label"] for r in lbl} == {0}


def test_scratch_dir_per_app_root_and_cleanup_registered(spark):
    """ADVICE r8: all scratch lives under ONE per-application root in
    the tempdir, repeated calls are stable, and the root is registered
    for atexit removal."""
    import tempfile

    from mapreduceinfrastructure_spark import scratch

    p1 = scratch.scratch_dir(spark, "kindx", "tagy")
    p2 = scratch.scratch_dir(spark, "kindx", "tagy")
    assert p1 == p2
    root = os.path.dirname(p1)
    assert os.path.dirname(root) == tempfile.gettempdir()
    assert os.path.basename(root) == f"mri_scratch_{scratch.app_tag(spark)}"
    assert root in scratch._REGISTERED


def test_kcore_trajectory_invariants(spark, sf_dir):
    """Monotone peel: nodes and edges never grow, removals account for
    the node deltas, and a zero-removal round freezes the trajectory."""
    rows = sorted(
        QUERIES["kcore_peel"](spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    from mapreduceinfrastructure_spark.operators.graph import KCORE_ROUNDS

    assert len(rows) == KCORE_ROUNDS
    frozen = False
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] == prev["n_nodes"] - cur["n_removed"]
        assert cur["n_edges"] <= prev["n_edges"]
        if prev["n_removed"] == 0:
            frozen = True
        if frozen:
            assert cur["n_removed"] == 0
            assert (cur["n_nodes"], cur["n_edges"]) == (
                prev["n_nodes"],
                prev["n_edges"],
            )
