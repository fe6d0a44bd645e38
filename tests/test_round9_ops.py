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
    dframe, rounds = _capped_pair_distances(und, DIAMETER_HOP_CAP)
    dist = {(r["a"], r["b"]): r["d"] for r in dframe.collect()}
    assert rounds == 1
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
    dframe, rounds = _capped_pair_distances(und, 3)
    dist = {(r["a"], r["b"]): r["d"] for r in dframe.collect()}
    for a in range(5):
        for b in range(5):
            want = abs(a - b)
            if 1 <= want <= 3:
                assert dist[(a, b)] == want, (a, b)
            else:
                assert (a, b) not in dist
    # cap=3 runs expansions k=2 and k=3, then the range (not a drain
    # round) ends the loop — exactly 2 rounds, never a wasted one
    assert rounds == 2


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


# ------------------------------------------------ round-9 new operators


def test_interval_concurrency_brute_force(spark, sf_dir):
    """Peak concurrency recomputed brute-force: per type, evaluate
    #covering intervals at every boundary timestamp in pandas."""
    from mapreduceinfrastructure_spark.operators.timeseries import _events_us

    iv = (
        _events_us(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.min("ts_us").alias("s"), F.max("ts_us").alias("e"))
        .collect()
    )
    by_type: dict = {}
    for r in iv:
        by_type.setdefault(r["event_type"], []).append((r["s"], r["e"]))
    got = {
        r["event_type"]: (r["peak_concurrency"], r["peak_ts_us"])
        for r in QUERIES["interval_concurrency"](spark, sf_dir).collect()
    }
    for et, spans in by_type.items():
        best, best_ts = -1, None
        for ts in sorted({s for s, _ in spans}):
            c = sum(1 for s, e in spans if s <= ts <= e)
            if c > best:
                best, best_ts = c, ts
        assert got[et] == (best, best_ts), (et, got[et], (best, best_ts))


def test_clustering_coeff_brute_force(spark, sf_dir):
    """Per-node triangle counts and coefficients recomputed from the
    raw co-purchase edge set in pure Python."""
    from itertools import combinations

    from mapreduceinfrastructure_spark.operators.graph import copurchase_edges

    edges = {(r["pa"], r["pb"]) for r in copurchase_edges(spark, sf_dir).collect()}
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    got = {
        r["node"]: (r["degree"], r["triangles"], r["coeff"])
        for r in QUERIES["clustering_coeff"](spark, sf_dir).collect()
    }
    assert set(got) == set(nbrs)
    for n, ns in nbrs.items():
        tri = sum(
            1
            for u, v in combinations(sorted(ns), 2)
            if (min(u, v), max(u, v)) in edges
        )
        deg = len(ns)
        coeff = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        gdeg, gtri, gcoeff = got[n]
        assert (gdeg, gtri) == (deg, tri), (n, got[n], (deg, tri))
        assert abs(gcoeff - coeff) < 1e-12


def test_mad_outliers_numpy_reference(spark, sf_dir):
    """Median/MAD recomputed with numpy; every emitted row's robust z
    matches and no qualifying event is missing."""
    import numpy as np

    from mapreduceinfrastructure_spark.operators.timeseries import MAD_K, MAD_Z
    from mapreduceinfrastructure_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["event_id"], r["value"]))
    want = {}
    for et, rows in by_type.items():
        vals = np.array([v for _, v in rows])
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        if mad <= 0:
            continue
        for eid, v in rows:
            rz = abs(v - med) / (MAD_K * mad)
            if rz >= MAD_Z:
                want[eid] = rz
    got = {
        r["event_id"]: r["robust_z"]
        for r in QUERIES["mad_outliers"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for eid, rz in want.items():
        assert abs(got[eid] - rz) < 1e-9


def test_event_trigrams_totals(spark, sf_dir):
    """Σ trigram counts = Σ_user max(0, n_events(user) − 2)."""
    from mapreduceinfrastructure_spark.sources.tables import load_table

    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want = sum(max(0, r["n"] - 2) for r in per_user)
    got = sum(r["cnt"] for r in QUERIES["event_trigrams"](spark, sf_dir).collect())
    assert got == want


def test_neyman_allocation_budget_and_quota_property(spark, sf_dir):
    """Largest-remainder invariants: allocations sum exactly to the
    budget and each stratum is within 1 of its exact proportional
    share (the defining property of the method)."""
    from mapreduceinfrastructure_spark.operators.pipeline import ALLOC_BUDGET

    rows = QUERIES["neyman_allocation"](spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == ALLOC_BUDGET
    tw = sum(r["weight"] for r in rows)
    for r in rows:
        exact = ALLOC_BUDGET * r["weight"] / tw
        assert exact - 1 < r["alloc"] < exact + 1, (r, exact)


def test_oov_rate_identities(spark, sf_dir):
    """Rates are consistent ratios and the corpus-wide in-vocab mass
    equals the total occurrences of the top-K vocabulary tokens."""
    from mapreduceinfrastructure_spark.functions.text import tokens_expr
    from mapreduceinfrastructure_spark.operators.pipeline import OOV_VOCAB_K
    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = QUERIES["oov_rate"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["rate"] - r["n_oov"] / r["n_tokens"]) < 1e-15
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_expr("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(OOV_VOCAB_K)
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    in_vocab = sum(r["n_tokens"] - r["n_oov"] for r in rows)
    assert in_vocab == toks


def test_dq_audit_detects_planted_violations(spark, sf_dir, tmp_path_factory):
    """Wiring check with CORRUPTED copies of the tables: every check
    must fire with exactly the planted violation counts."""
    import os

    from mapreduceinfrastructure_spark.sources.tables import load_table

    d = str(tmp_path_factory.mktemp("dq_corrupt"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0]
    # plant: 2 orphan lineitems (unknown orderkey), 1 duplicated line
    # key, 1 nonpositive quantity, 1 discount out of range
    first = li.limit(1)
    orphans = first.withColumn("l_orderkey", F.lit(max_ok + 10_000)).union(
        first.withColumn("l_orderkey", F.lit(max_ok + 10_001))
    )
    dup = first
    badq = first.withColumn("l_linenumber", F.lit(990)).withColumn(
        "l_quantity", F.lit(-4.0)
    )
    badd = first.withColumn("l_linenumber", F.lit(991)).withColumn(
        "l_discount", F.lit(1.5)
    )
    li.union(orphans).union(dup).union(badq).union(badd).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "lineitem.parquet"))
    # plant: 1 childless order, 1 order with unknown customer
    o1 = orders.limit(1).withColumn("o_orderkey", F.lit(max_ok + 20_000))
    max_ck = cust.agg(F.max("c_custkey")).collect()[0][0]
    o2 = (
        orders.limit(1)
        .withColumn("o_orderkey", F.lit(max_ok + 20_001))
        .withColumn("o_custkey", F.lit(max_ck + 5_000))
    )
    orders.union(o1).union(o2).write.mode("overwrite").parquet(
        os.path.join(d, "orders.parquet")
    )
    cust.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    got = {
        r["check"]: r["n_violations"]
        for r in QUERIES["dq_referential_audit"](spark, d).collect()
    }
    assert got["orphan_lineitems"] == 2
    # planted childless order + the unknown-customer order (also
    # childless) on top of whatever the base data already had
    base = {
        r["check"]: r["n_violations"]
        for r in QUERIES["dq_referential_audit"](spark, sf_dir).collect()
    }
    assert got["childless_orders"] == base["childless_orders"] + 2
    assert got["orders_unknown_customer"] == 1
    assert got["duplicate_line_keys"] == base["duplicate_line_keys"] + 1
    assert got["nonpositive_quantity"] == 1
    assert got["discount_out_of_range"] == 1


def test_evolution_roundtrip_merged_schema(spark, sf_dir):
    """The merged read exposes the evolved column with NULLs exactly on
    pre-evolution rows."""
    rows = QUERIES["evolution_roundtrip"](spark, sf_dir).collect()
    assert rows
    from mapreduceinfrastructure_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pre = docs.filter(F.col("doc_id") % 3 != 0).count()
    assert sum(r["n_pre_evolution"] for r in rows) == pre
    assert sum(r["n_docs"] for r in rows) == docs.count()


# ------------------------------------------- round-9 second batch


def test_sssp_matches_networkx_free_dijkstra(spark, sf_dir):
    """Distances recomputed with a pure-Python Dijkstra, capped at the
    same hop count via Bellman-Ford rounds (round-limited min-plus in
    python) — must equal the operator exactly."""
    from mapreduceinfrastructure_spark.operators.graph import (
        SSSP_ROUNDS,
        copurchase_weighted,
    )

    rows = copurchase_weighted(spark, sf_dir).collect()
    assert rows
    max_w = max(r["w"] for r in rows)
    adj: dict = {}
    for r in rows:
        c = max_w + 1 - r["w"]
        adj.setdefault(r["pa"], []).append((r["pb"], c))
        adj.setdefault(r["pb"], []).append((r["pa"], c))
    src = max(adj, key=lambda u: (len(adj[u]), -u))
    dist = {src: 0}
    for _ in range(SSSP_ROUNDS):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, c in adj[u]:
                if d + c < nxt.get(v, float("inf")):
                    nxt[v] = d + c
        dist = nxt
    got = {r["node"]: r["dist"] for r in QUERIES["sssp_parts"](spark, sf_dir).collect()}
    assert got == dist


def test_streaming_ohlc_equals_batch_bars(spark, sf_dir):
    """The streaming state merge must equal the batch aggregation —
    the algebraic-rollup claim of ohlc_bars, checked engine-side."""
    got = {
        (r["event_type"], r["bucket_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in QUERIES["streaming_ohlc"](spark, sf_dir).collect()
    }
    want = {
        (r["event_type"], r["bucket_us"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in QUERIES["ohlc_bars"](spark, sf_dir).collect()
    }
    assert got == want


def test_null_safe_join_null_bucket_semantics(spark, sf_dir):
    """The defining divergence: the NULL bucket matches under <=> and
    never under =; non-null buckets match under both."""
    rows = {r["key_bucket"]: r for r in QUERIES["null_safe_join"](spark, sf_dir).collect()}
    assert "<NULL>" in rows, "corpus must produce a NULL key bucket"
    nb = rows["<NULL>"]
    assert nb["n_nullsafe_matched"] == nb["n_rows"]
    assert nb["n_plain_matched"] == 0
    for k, r in rows.items():
        if k != "<NULL>":
            assert r["n_nullsafe_matched"] == r["n_rows"] == r["n_plain_matched"]


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    """merge(partial(base), partial(delta)) == full(base ∪ delta),
    checked engine-side against a direct full aggregation."""
    from mapreduceinfrastructure_spark.functions.text import tokens_expr
    from mapreduceinfrastructure_spark.sources.tables import load_table

    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["max_doc_id"])
        for r in QUERIES["ivm_source_stats"](spark, sf_dir).collect()
    }
    full = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "source", "n_chars",
            F.size(tokens_expr("text")).cast("long").alias("n_toks"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .collect()
    )
    want = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_chars"], r["max_doc_id"])
        for r in full
    }
    assert got == want


def test_array_funcs_catalog_spot_check(spark, sf_dir):
    """One document's row recomputed in pure Python from the tokenizer
    contract (strtok semantics: split on the delimiter class, drop
    empties)."""
    import re as _re

    from mapreduceinfrastructure_spark.sources.tables import load_table

    doc = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(1).collect()[0]
    toks = [t for t in _re.split(r"[ ,.\"']", doc["text"]) if t]
    row = [
        r for r in QUERIES["array_funcs_catalog"](spark, sf_dir).collect()
        if r["doc_id"] == doc["doc_id"]
    ][0]
    assert row["n_tokens"] == len(toks)
    assert row["first5"] == "|".join(toks[:5])
    assert row["n_distinct"] == len(set(toks))
    assert row["min_token"] == min(toks)
    assert row["max_token"] == max(toks)
    assert row["n_long"] == sum(1 for t in toks if len(t) > 4)
    assert row["first3_upper"] == "|".join(t.upper() for t in toks[:3])
    assert row["sum_len"] == sum(len(t) for t in toks)
    assert row["has_the"] == int("the" in toks)
    assert row["the_pos"] == (toks.index("the") + 1 if "the" in toks else 0)


# ------------------------------------------- round-9 third batch


def test_abandoned_views_cross_batch_flush(spark, sf_dir):
    """The outer join's defining behavior, cross-micro-batch: a view
    in batch 1 with NO purchase must flush with NULLs only after the
    watermark (advanced by batch 2's sentinel) passes its window, and
    a view whose purchase arrives in a LATER batch must pair, not
    flush.  Built on a tiny controlled 3-file feed."""
    import os

    from mapreduceinfrastructure_spark.streaming.event_stream import (
        abandoned_views_stream,
        run_stream_to_memory,
    )

    import tempfile

    d = tempfile.mkdtemp(prefix="loj_test_")
    base = 1_700_000_000_000_000  # epoch us
    mk = lambda rows: spark.createDataFrame(
        rows, schema="event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id", "event_type"
    )
    # batch 1: user 1 view (will pair in batch 2), user 2 view (never pairs)
    b1 = mk([(1, base, 1, "view"), (2, base, 2, "view")])
    # batch 2: user 1 purchase 10 min later (inside the 30-min gap)
    b2 = mk([(3, base + 600_000_000, 1, "purchase")])
    # batch 3: far-future sentinel pair advances both watermarks
    b3 = mk(
        [(-1, base + 20_000_000_000_000, -1, "view"),
         (-2, base + 20_000_000_000_000, -1, "purchase")]
    )
    for i, df in enumerate((b1, b2, b3)):
        p = os.path.join(d, f"f{i}")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        for fn in os.listdir(p):
            os.utime(os.path.join(p, fn), (1_700_000_000 + i * 10,) * 2)
    schema = b1.schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    got = run_stream_to_memory(
        spark, abandoned_views_stream(ev), "loj_xbatch", output_mode="append"
    )
    rows = {
        (r["user_id"], r["view_id"]): r["purchase_id"]
        for r in got.filter(F.col("user_id") >= 0).collect()
    }
    assert rows == {(1, 1): 3, (2, 2): None}, rows


def test_sentence_stats_spot_check(spark, sf_dir):
    """One document recomputed in pure Python with the same sentence
    and token contracts."""
    import re as _re

    from mapreduceinfrastructure_spark.sources.tables import load_table

    doc = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(1).collect()[0]
    sents = [s for s in _re.split(r"[.!?]", doc["text"]) if s.strip()]
    tcs = [len([t for t in _re.split(r"[ ,.\"']", s) if t]) for s in sents]
    row = [
        r for r in QUERIES["sentence_stats"](spark, sf_dir).collect()
        if r["doc_id"] == doc["doc_id"]
    ][0]
    assert row["n_sentences"] == len(sents)
    assert row["n_tokens"] == sum(tcs)
    assert row["max_sentence_tokens"] == (max(tcs) if tcs else 0)
    assert abs(row["avg_sentence_tokens"] - (sum(tcs) / len(sents) if sents else 0.0)) < 1e-12


def test_basket_triples_brute_force(spark, sf_dir):
    """Triples recomputed from per-order part sets in pure Python, and
    the Apriori property holds: every frequent triple's three pairs
    are frequent."""
    from itertools import combinations

    from mapreduceinfrastructure_spark.operators.graph import (
        COPURCHASE_MIN_W,
        copurchase_edges,
    )
    from mapreduceinfrastructure_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    counts: dict = {}
    for parts in baskets.values():
        for tri in combinations(sorted(parts), 3):
            counts[tri] = counts.get(tri, 0) + 1
    want = {t: c for t, c in counts.items() if c >= COPURCHASE_MIN_W}
    got = {
        (r["pa"], r["pb"], r["pc"]): r["n_orders"]
        for r in QUERIES["basket_triples"](spark, sf_dir).collect()
    }
    assert got == want
    pairs = {(r["pa"], r["pb"]) for r in copurchase_edges(spark, sf_dir).collect()}
    for (a, b, c) in got:
        assert {(a, b), (a, c), (b, c)} <= pairs


# ------------------------------------------------- round-9 batch 2 ops


def test_linreg_matches_numpy_polyfit(spark, sf_dir):
    """Slope/intercept/r2 per brand must match an independent numpy
    least-squares on the same (quantity, price) points — the moments
    formulation vs the QR path, agreeing to float tolerance."""
    import numpy as np

    got = {
        r["p_brand"]: r
        for r in QUERIES["linreg_by_group"](spark, sf_dir).collect()
    }
    pdf = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .join(
            spark.read.parquet(os.path.join(sf_dir, "part.parquet")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("p_brand", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for brand, g in pdf.groupby("p_brand"):
        x = g["l_quantity"].to_numpy()
        y = np.round(g["l_extendedprice"].to_numpy() * 100) / 100
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got[brand]
        assert row["n"] == len(g)
        assert abs(row["slope"] - slope) < 1e-4
        assert abs(row["intercept"] - intercept) < 1e-2
        assert abs(row["r2"] - r * r) < 1e-6
        assert 0.0 <= row["r2"] <= 1.0


def test_weighted_median_defining_property(spark, sf_dir):
    """The lower weighted median m must satisfy: weight strictly below
    m < half total, and weight at-or-below m >= half total."""
    rows = QUERIES["weighted_median"](spark, sf_dir).collect()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    for r in rows:
        g = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        tot = g.agg(F.sum(F.col("l_quantity").cast("long"))).collect()[0][0]
        assert tot == r["total_weight"]
        below = (
            g.filter(F.col("l_extendedprice") < r["wmedian"])
            .agg(F.sum(F.col("l_quantity").cast("long")))
            .collect()[0][0]
            or 0
        )
        at_or_below = (
            g.filter(F.col("l_extendedprice") <= r["wmedian"])
            .agg(F.sum(F.col("l_quantity").cast("long")))
            .collect()[0][0]
        )
        assert 2 * below < tot <= 2 * at_or_below


def test_benford_shares_and_chi2(spark, sf_dir):
    """Digits 1..9 exactly once each, observed shares sum to 1,
    Benford shares sum to 1 (log10 telescoping), chi2 terms >= 0."""
    rows = QUERIES["benford_digits"](spark, sf_dir).collect()
    digits = sorted(r["digit"] for r in rows)
    assert digits == list(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4
    assert all(r["chi2_term"] >= 0.0 for r in rows)


def test_gaps_islands_vs_python_reference(spark, sf_dir):
    """Streaks per user must equal a pure-Python islands computation
    over the same distinct day indexes."""
    from mapreduceinfrastructure_spark.operators.timeseries import (
        DAY_US,
        _events_us,
    )

    got = {
        r["user_id"]: r for r in QUERIES["gaps_islands"](spark, sf_dir).collect()
    }
    days = (
        _events_us(spark, sf_dir)
        .select("user_id", ((F.col("ts_us") - F.col("ts_us") % DAY_US) / DAY_US)
                .cast("long").alias("day"))
        .distinct()
        .collect()
    )
    by_user: dict[int, list[int]] = {}
    for r in days:
        by_user.setdefault(r["user_id"], []).append(r["day"])
    for uid, ds in by_user.items():
        ds.sort()
        runs = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append((start, prev - start + 1))
                start = prev = d
        runs.append((start, prev - start + 1))
        row = got[uid]
        assert row["active_days"] == len(ds)
        assert row["n_islands"] == len(runs)
        best = max(l for _, l in runs)
        assert row["max_streak"] == best
        assert row["max_streak_start"] == min(s for s, l in runs if l == best)


def test_kaplan_meier_monotone_and_lifelines_free_reference(spark, sf_dir):
    """S(t) must be non-increasing in [0, 1] and equal a pure-Python
    product-limit computation over the same (duration, observed)
    pairs."""
    from mapreduceinfrastructure_spark.operators.timeseries import (
        HOUR_US,
        _events_us,
    )

    rows = sorted(
        QUERIES["kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r["t_hours"],
    )
    surv = [r["surv"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))

    per_user = (
        _events_us(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.min("ts_us").alias("t0"),
            F.max("ts_us").alias("tl"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts_us"))
            ).alias("tb"),
        )
        .collect()
    )
    durs = []
    for r in per_user:
        if r["tb"] is not None:
            durs.append(((r["tb"] - r["t0"]) // HOUR_US, 1))
        else:
            durs.append(((r["tl"] - r["t0"]) // HOUR_US, 0))
    ts = sorted({t for t, o in durs if o == 1})
    s = 1.0
    want = {}
    for t in ts:
        n_risk = sum(1 for d, _ in durs if d >= t)
        d_t = sum(1 for d, o in durs if d == t and o == 1)
        s *= 1.0 - d_t / n_risk
        want[t] = (n_risk, d_t, s)
    assert len(rows) == len(ts)
    for r in rows:
        n_risk, d_t, s = want[r["t_hours"]]
        assert r["n_risk"] == n_risk
        assert r["n_events"] == d_t
        assert abs(r["surv"] - s) < 1e-6


def test_snm_no_false_positives_and_window_bound(spark, sf_dir):
    """Every reported SNM pair must (a) really have distinct-token
    Jaccard >= the threshold (exact recompute from raw text) and
    (b) be within the sliding window in the block sort order."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        SNM_JACCARD_T,
        SNM_WINDOW,
    )
    from mapreduceinfrastructure_spark.functions.text import tokens_expr
    import re

    pairs = QUERIES["sorted_neighborhood_neardup"](spark, sf_dir).collect()
    assert pairs, "sf corpus is known to contain near-dups"
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).collect()
    }
    tok_re = re.compile(r"[ ,.\"']")

    def toks(t):
        return {x for x in tok_re.split(t) if x}

    order = sorted(
        (
            (
                re.sub(r"[^a-z0-9]", "", t.lower()[:64])[:2],
                re.sub(r"[^a-z0-9]", "", t.lower()[:64]),
                did,
            )
            for did, t in docs.items()
        )
    )
    # positions within block: recompute rank per block
    rank: dict[int, tuple[str, int]] = {}
    cur_blk, idx = None, 0
    for blk, k, did in sorted(order, key=lambda x: (x[0], x[1], x[2])):
        if blk != cur_blk:
            cur_blk, idx = blk, 0
        idx += 1
        rank[did] = (blk, idx)
    for p in pairs:
        ta, tb = toks(docs[p["da"]]), toks(docs[p["db"]])
        j = len(ta & tb) / len(ta | tb)
        assert round(j, 6) >= SNM_JACCARD_T
        assert abs(round(j, 6) - p["jaccard"]) < 1e-9
        ba, ia = rank[p["da"]]
        bb, ib = rank[p["db"]]
        assert ba == bb and 1 <= abs(ia - ib) <= SNM_WINDOW - 1
