"""Cross-checks for the round-8 operators beyond oracle parity."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

QUERIES = entrymod.queries()


def test_ppjoin_prunes_strictly_more_than_vcl(spark, sf_dir):
    """The point of PPJoin (VERDICT r7 #5): on the same corpus the
    length + positional filters admit STRICTLY fewer candidate pairs
    into the intersection-count agg than the VCL prefix join — and
    every pruned pair was a true negative (the result set is
    identical, which the oracle gate also proves independently)."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        _prefix_frames,
        ppjoin_candidates,
        vcl_candidates,
    )

    _, pref = _prefix_frames(spark, sf_dir)
    pref = pref.localCheckpoint(eager=True)  # one shingle pass, two consumers
    n_vcl = vcl_candidates(pref).count()
    n_pp = ppjoin_candidates(pref).count()
    assert n_pp < n_vcl, (n_pp, n_vcl)
    # the surviving candidates still cover the full result set
    result = {
        (r["da"], r["db"])
        for r in QUERIES["ppjoin_neardup"](spark, sf_dir).collect()
    }
    baseline = {
        (r["da"], r["db"])
        for r in QUERIES["prefix_filter_neardup"](spark, sf_dir).collect()
    }
    assert result == baseline, result.symmetric_difference(baseline)


def test_ppjoin_candidates_superset_of_result(spark, sf_dir):
    """Losslessness stated directly on the candidate stream: every
    reported pair is a surviving candidate (the filters only ever
    remove pairs that cannot reach the threshold)."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        _prefix_frames,
        ppjoin_candidates,
    )

    _, pref = _prefix_frames(spark, sf_dir)
    cand = {
        (r["da"], r["db"]) for r in ppjoin_candidates(pref).collect()
    }
    result = {
        (r["da"], r["db"])
        for r in QUERIES["ppjoin_neardup"](spark, sf_dir).collect()
    }
    assert result <= cand


def test_pagerank_docs_invariants(spark, sf_dir):
    """Rank mass sums to 1 over the pair-graph nodes, every rank is
    positive, and the fixed-iteration trajectory is deterministic
    across runs (same literals, same checkpoint discipline)."""
    rows = QUERIES["pagerank_docs"](spark, sf_dir).collect()
    assert rows, "test corpora have near-dup pairs at t=0.6"
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-3, total  # ranks rounded to 6dp
    assert all(r["rank"] > 0 for r in rows)
    again = {
        r["doc_id"]: r["rank"]
        for r in QUERIES["pagerank_docs"](spark, sf_dir).collect()
    }
    assert {r["doc_id"]: r["rank"] for r in rows} == again


def test_pagerank_docs_empty_graph(spark, tmp_path):
    """No near-dup pairs -> empty result with the stable schema (the
    graph/iterative empty-input guard convention)."""
    import os

    docs = spark.createDataFrame(
        [(i, "s", f"utterly unique text number {i} " + " ".join(
            f"tok{i}_{j}" for j in range(6))) for i in range(8)],
        schema="doc_id long, source string, text string",
    )
    sf = str(tmp_path / "sf_empty")
    os.makedirs(sf, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from mapreduceinfrastructure_spark.operators.graph import pagerank_docs

    out = pagerank_docs(spark, sf)
    assert out.columns == ["doc_id", "rank"]
    assert out.count() == 0


def test_compaction_merge_semantics(spark, sf_dir):
    """The merge-on-read query's row-level promises, checked against
    the source table: tombstoned doc_ids are gone, upserted docs carry
    the revision marker, untouched docs are byte-identical."""
    from mapreduceinfrastructure_spark.sources.tables import load_table

    # re-run the operator to materialize its layout, then re-read the
    # compacted output it wrote (same path derivation)
    QUERIES["compaction_roundtrip"](spark, sf_dir).collect()
    import os

    from mapreduceinfrastructure_spark.scratch import scratch_dir

    root = scratch_dir(
        spark, "mor", os.path.basename(os.path.normpath(sf_dir))
    )
    back = spark.read.parquet(os.path.join(root, "compacted"))
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_deleted = docs.filter(F.col("doc_id") % 13 == 0).count()
    assert back.count() == n_docs - n_deleted
    assert back.filter(F.col("doc_id") % 13 == 0).count() == 0
    upd = back.filter(F.col("version") == 1)
    assert upd.filter(~F.col("text").endswith(" [revised]")).count() == 0
    untouched = back.filter(F.col("version") == 0).join(
        docs.select("doc_id", F.col("text").alias("orig")), "doc_id"
    )
    assert untouched.filter(F.col("text") != F.col("orig")).count() == 0


def test_matmul_bucket_ids_match_hof(spark, sf_dir):
    """The Arrow-batched matmul bucket builder is bit-identical to the
    JVM HOF twin on the real test corpus: a sign flip would need a
    hyperplane dot within float-summation error of zero (~1e-13
    relative), and the smallest |dot| on N(0,1) data sits orders of
    magnitude above that — so candidate generation is unchanged, only
    ~1000x cheaper (see _bucket_ids_matmul's docstring)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        STRICT_BITS_FLOOR,
        STRICT_N_TABLES,
        _bucket_ids_flat,
        _bucket_ids_matmul,
        _embeddings,
    )

    emb = _embeddings(spark, sf_dir)
    got = (
        emb.select(
            "vec_id",
            _bucket_ids_matmul(STRICT_N_TABLES, STRICT_BITS_FLOOR).alias("m"),
            _bucket_ids_flat(STRICT_N_TABLES, STRICT_BITS_FLOOR).alias("h"),
        )
        .filter(F.col("m") != F.col("h"))
        .count()
    )
    assert got == 0


def test_funnel_pairs_join_across_micro_batches(spark, sf_dir, tmp_path):
    """The property that makes a stream-stream join its own state
    machine: a view buffered in micro-batch 1 must still pair with a
    purchase arriving in micro-batch 2 (and vice versa for purchases
    preceding late-arriving views within the same batch split).  Feed
    the same events as TWO files split at the time median with
    maxFilesPerTrigger=1 and require the exact pair set the one-batch
    run (and the batch SQL oracle) produces."""
    import os

    from mapreduceinfrastructure_spark.sources.tables import (
        event_ts_us,
        load_table,
    )
    from mapreduceinfrastructure_spark.streaming.event_stream import (
        funnel_pairs_stream,
        run_stream_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    ev_us = ev.withColumn("ts_us", event_ts_us(ev))
    median_us = ev_us.approxQuantile("ts_us", [0.5], 0.0)[0]
    d = tmp_path / "funnel_stream"
    d.mkdir()
    ev_us.filter(F.col("ts_us") <= median_us).drop("ts_us").toPandas().to_parquet(
        d / "f1.parquet"
    )
    ev_us.filter(F.col("ts_us") > median_us).drop("ts_us").toPandas().to_parquet(
        d / "f2.parquet"
    )
    os.utime(d / "f1.parquet", (1_000, 1_000))  # oldest-first processing
    os.utime(d / "f2.parquet", (2_000, 2_000))
    schema = spark.read.parquet(str(d / "f1.parquet")).schema
    ds = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    # pandas writes ts as TIMESTAMP(NANOS); under nanosAsLong the
    # stream sees a bigint — the read_events_stream branch, mirrored
    if dict(ds.dtypes)["ts"] == "bigint":
        ds = ds.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ds = ds.withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        tuple(r)
        for r in run_stream_to_memory(
            spark, funnel_pairs_stream(ds), "funnel_xbatch", output_mode="append"
        ).collect()
    }
    import __spark_entry__ as e

    want = {
        tuple(r) for r in e.queries()["streaming_funnel_pairs"](spark, sf_dir).collect()
    }
    assert got == want, got.symmetric_difference(want)
    assert want, "test corpora have view->purchase pairs in the gap"


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """With the size gates lowered to the test SF, Catalyst must plant
    the runtime bloom filter on runtime_filter_join's fact side — a
    bloom_filter_agg over the filtered orders keys and a might_contain
    probe pushed into the lineitem scan filter — and the result must
    be byte-identical with the rewrite on and off (the filter is pure
    pruning; the oracle gate proves the same thing externally)."""
    import __spark_entry__ as e

    conf = spark.conf
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set(keys[0], "0")
        conf.set(keys[1], "-1")  # broadcast would bypass the injection gate
        df = e.queries()["runtime_filter_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        gated = {tuple(r) for r in df.collect()}
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    plain_df = e.queries()["runtime_filter_join"](spark, sf_dir)
    plain_plan = plain_df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in plain_plan  # gate respected at test SF
    assert {tuple(r) for r in plain_df.collect()} == gated


def test_cluster_diameter_consistency(spark, sf_dir):
    """Structural invariants against dedup_clusters on the same edges:
    same cluster ids and sizes; every diameter within [1, cap+1];
    diameter 1 iff the cluster is a clique (n_edges == n(n-1)/2); a
    2-doc cluster is always diameter 1."""
    from mapreduceinfrastructure_spark.operators.dedup import DIAMETER_HOP_CAP

    rows = QUERIES["cluster_diameter"](spark, sf_dir).collect()
    assert rows
    cl = QUERIES["dedup_clusters"](spark, sf_dir).collect()
    sizes = {}
    for r in cl:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    assert {r["cluster_id"] for r in rows} == set(sizes)
    for r in rows:
        assert r["n_docs"] == sizes[r["cluster_id"]]
        assert 1 <= r["diameter"] <= DIAMETER_HOP_CAP + 1, r
        clique_edges = r["n_docs"] * (r["n_docs"] - 1) // 2
        assert r["n_edges"] <= clique_edges
        assert (r["diameter"] == 1) == (r["n_edges"] == clique_edges), r
        if r["n_docs"] == 2:
            assert r["diameter"] == 1


def test_cc_star_equals_label_propagation(spark, sf_dir):
    """The two CC algorithms (min-label propagation + pointer jumping
    vs alternating large-star/small-star) must produce the identical
    (doc_id, cluster_id) frame on the real near-dup graph."""
    star = {tuple(r) for r in QUERIES["cc_star"](spark, sf_dir).collect()}
    prop = {tuple(r) for r in QUERIES["dedup_clusters"](spark, sf_dir).collect()}
    assert star == prop, star.symmetric_difference(prop)


def test_star_contraction_synthetic_graphs(spark):
    """The shapes that separate the algorithms: a long CHAIN (the
    O(diameter) worst case for label propagation — star contraction
    must still converge inside its round cap and label everything with
    the chain minimum) and a STAR plus a disjoint TRIANGLE (multiple
    components, hub not the minimum)."""
    from mapreduceinfrastructure_spark.operators.graph import star_contraction

    def sym(pairs):
        df = spark.createDataFrame(pairs, "a long, b long")
        return df.union(df.select(F.col("b").alias("a"), F.col("a").alias("b")))

    chain = sym([(i, i + 1) for i in range(1, 60)])
    got = {tuple(r) for r in star_contraction(chain).collect()}
    assert got == {(i, 1) for i in range(1, 61)}

    # star hub=50 with leaves 51..60 plus leaf 7 (the true minimum),
    # and a disjoint triangle 100-101-102
    star = sym(
        [(50, x) for x in [7, *range(51, 61)]]
        + [(100, 101), (101, 102), (100, 102)]
    )
    got = {tuple(r) for r in star_contraction(star).collect()}
    want = {(50, 7), (7, 7)} | {(x, 7) for x in range(51, 61)}
    want |= {(100, 100), (101, 100), (102, 100)}
    assert got == want


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    """The point of the Z-order layout: per-file (min, max) envelopes
    stay narrow in BOTH interleaved dimensions, so range predicates on
    EITHER column skip most files — while a ship_day-sorted layout of
    the same rows into the same file count prunes only ship_day
    predicates (its partkey envelopes span essentially the full
    domain).  Overlap fractions are computed against 8 equal-width
    range predicates per dimension, straight from the envelope frames."""
    from pyspark.sql import Window

    from mapreduceinfrastructure_spark.operators.advanced import Z_FILES_LOG2
    from mapreduceinfrastructure_spark.sources.tables import load_table

    zstats = QUERIES["zorder_layout"](spark, sf_dir).collect()
    n_files = 1 << Z_FILES_LOG2
    assert len(zstats) == n_files
    assert sum(r["n_rows"] for r in zstats) == load_table(
        spark, sf_dir, "lineitem"
    ).count()

    # ship_day-sorted twin: same rows, same file count, 1-D layout
    li = load_table(spark, sf_dir, "lineitem").select(
        F.datediff("l_shipdate", F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("ship_day"),
        F.col("l_partkey").cast("long").alias("partkey"),
    )
    n = li.count()
    w = Window.orderBy("ship_day", "partkey")
    sorted_stats = (
        li.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("f", (F.col("rn") * n_files / n).cast("long"))
        .groupBy("f")
        .agg(
            F.min("ship_day").alias("min_day"),
            F.max("ship_day").alias("max_day"),
            F.min("partkey").alias("min_part"),
            F.max("partkey").alias("max_part"),
        )
        .collect()
    )

    def overlap_fraction(stats, lo_k, hi_k):
        los = [r[lo_k] for r in stats]
        his = [r[hi_k] for r in stats]
        lo, hi = min(los), max(his)
        span = (hi - lo + 1) / 8
        fracs = []
        for q in range(8):
            q_lo, q_hi = lo + q * span, lo + (q + 1) * span - 1
            hit = sum(1 for l, h in zip(los, his) if h >= q_lo and l <= q_hi)
            fracs.append(hit / len(stats))
        return sum(fracs) / len(fracs)

    z_day = overlap_fraction(zstats, "min_day", "max_day")
    z_part = overlap_fraction(zstats, "min_part", "max_part")
    s_day = overlap_fraction(sorted_stats, "min_day", "max_day")
    s_part = overlap_fraction(sorted_stats, "min_part", "max_part")
    # Z-order: BOTH dimensions prune well under half the files
    assert z_day < 0.5, z_day
    assert z_part < 0.5, z_part
    # the 1-D layout prunes its own sort column fine ...
    assert s_day < 0.5, s_day
    # ... but cannot prune the other dimension at all
    assert s_part > 0.9, s_part


def test_skew_profile_separates_regimes(spark, sf_dir):
    """The audit must actually separate the shuffle regimes it exists
    to detect: the 5-value categorical key concentrates its mass on a
    handful of reducers (high skew ratio, most reducers empty — the
    salting/broadcast signal), while the wide uniform fact keys load
    all reducers within a small factor of the ideal."""
    from mapreduceinfrastructure_spark.operators.advanced import SKEW_REDUCERS

    rows = {r["key_name"]: r for r in QUERIES["skew_profile"](spark, sf_dir).collect()}
    cat = rows["events.event_type"]
    assert cat["n_keys"] < SKEW_REDUCERS
    assert cat["n_empty_reducers"] >= SKEW_REDUCERS - cat["n_keys"]
    assert cat["skew_ratio"] > 4, cat
    for uniform in ("lineitem.l_suppkey", "lineitem.l_partkey"):
        r = rows[uniform]
        assert r["n_empty_reducers"] == 0, r
        assert r["skew_ratio"] < 2.5, r
        assert r["top_share"] < 0.05, r


def test_kcore_peel_trajectory_invariants(spark, sf_dir):
    """The peel must be monotone (node/edge counts never grow, removal
    counts sum to the node delta) and, at the test SF, actually peel
    (round 1 removes nodes): a no-op trajectory would mean the K/min-
    weight constants stopped exercising the operator."""
    from mapreduceinfrastructure_spark.operators.graph import KCORE_ROUNDS

    rows = sorted(
        QUERIES["kcore_peel"](spark, sf_dir).collect(),
        key=lambda r: r["iteration"],
    )
    assert [r["iteration"] for r in rows] == list(range(1, KCORE_ROUNDS + 1))
    assert rows[0]["n_removed"] > 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_nodes"] == prev["n_nodes"] - cur["n_removed"]
        assert cur["n_nodes"] <= prev["n_nodes"]
        assert cur["n_edges"] <= prev["n_edges"]
        # a dead graph stays dead (the padding path)
        if prev["n_edges"] == 0:
            assert cur["n_edges"] == 0 and cur["n_removed"] == 0


def test_kcore_final_degrees_clear_k(spark, sf_dir):
    """Semantic pin of the peel rule: re-derive the surviving edge set
    by running the same rounds and check every remaining node has
    degree >= KCORE_K *within the survivor graph* once the trajectory
    reports a converged round (n_removed == 0)."""
    from mapreduceinfrastructure_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        copurchase_edges,
    )

    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    converged = False
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("pa").alias("n"))
            .union(edges.select(F.col("pb").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= KCORE_K).select("n")
        nxt = (
            edges.join(keep.withColumnRenamed("n", "pa"), "pa", "left_semi")
            .join(keep.withColumnRenamed("n", "pb"), "pb", "left_semi")
            .select("pa", "pb")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == edges.count():
            converged = True
        edges = nxt
    if converged and edges.count() > 0:
        min_deg = (
            edges.select(F.col("pa").alias("n"))
            .union(edges.select(F.col("pb").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
            .agg(F.min("d").alias("m"))
            .collect()[0]["m"]
        )
        assert min_deg >= KCORE_K, min_deg


def test_range_partition_plan_is_a_partition(spark, sf_dir):
    """The ranges must tile the key space: contiguous non-overlapping
    [lo, hi] day intervals in range_id order, row counts summing to
    the table total, and equi-depth balance on the uniform ship-date
    key (every range within 2x of ideal; boundaries land within one
    day's mass of the quantile grid)."""
    from mapreduceinfrastructure_spark.operators.advanced import RANGE_PARTS

    rows = sorted(
        QUERIES["range_partition_plan"](spark, sf_dir).collect(),
        key=lambda r: r["range_id"],
    )
    assert 1 <= len(rows) <= RANGE_PARTS
    total = sum(r["n_rows"] for r in rows)
    from mapreduceinfrastructure_spark.sources.tables import load_table

    assert total == load_table(spark, sf_dir, "lineitem").count()
    for prev, cur in zip(rows, rows[1:]):
        assert prev["hi_day"] < cur["lo_day"]  # disjoint, ordered
    for r in rows:
        assert r["lo_day"] <= r["hi_day"]
        assert abs(r["share"] - r["n_rows"] / total) < 1e-5
        # ship dates are near-uniform: equi-depth keeps every range
        # within a small factor of ideal
        assert r["skew_ratio"] < 2.0, r


def test_ewma_anomaly_scores_against_history_only(spark, sf_dir):
    """Re-derive one flagged event's score from its user's raw stream
    with plain Python: the trailing window must exclude the event
    itself (no self-leakage) and reproduce ewma/z exactly."""
    from mapreduceinfrastructure_spark.operators.timeseries import (
        EWMA_ALPHA,
        EWMA_WIN,
        _events_us,
    )

    out = QUERIES["ewma_anomaly"](spark, sf_dir)
    pick = out.orderBy("user_id", "event_id").limit(1).collect()[0]
    hist = (
        _events_us(spark, sf_dir)
        .filter(F.col("user_id") == pick["user_id"])
        .select("event_id", "ts_us", "value")
        .collect()
    )
    hist.sort(key=lambda r: (r["ts_us"], r["event_id"]))
    idx = next(
        i for i, r in enumerate(hist) if r["event_id"] == pick["event_id"]
    )
    window = [r["value"] for r in hist[max(0, idx - EWMA_WIN) : idx]]
    assert len(window) >= 4
    ewma = window[0]
    for x in window[1:]:
        ewma = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * ewma
    assert abs(ewma - pick["ewma_prev"]) < 1e-9
    n = len(window)
    s1, s2 = sum(window), sum(x * x for x in window)
    sd = max((s2 - s1 * s1 / n) / (n - 1), 0.0) ** 0.5
    assert abs((pick["value"] - ewma) / sd - pick["zscore"]) < 1e-6


def test_kl_source_divergence_properties(spark, sf_dir):
    """Gibbs' inequality pins the math: KL >= 0 for every source, and
    a synthetic two-source corpus with one source exactly matching the
    corpus mixture... is impossible (the mixture includes both), so
    instead: uniform-identical sources => KL == 0."""
    rows = QUERIES["kl_source_divergence"](spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["kl_vs_corpus"] >= 0, r
        assert r["vocab"] <= r["n_tokens"]
    # identical sources: every source token distribution == corpus
    # distribution => KL exactly 0
    from mapreduceinfrastructure_spark.operators.pipeline import (
        kl_source_divergence,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", "en", "s1", 16),
                (2, "alpha beta gamma", "en", "s2", 16),
            ],
            schema="doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r["source"]: r for r in kl_source_divergence(spark, td).collect()}
        assert set(out) == {"s1", "s2"}
        for r in out.values():
            assert abs(r["kl_vs_corpus"]) < 1e-12


def test_streaming_dedup_state_carries_across_batches(spark, sf_dir, tmp_path):
    """The property that distinguishes dropDuplicatesWithinWatermark
    from per-batch distinct: a key first seen in micro-batch 1 must
    suppress its duplicate arriving in micro-batch 2.  Feed the same
    events as TWO files split at the time median (maxFilesPerTrigger=1,
    oldest first) and require the per-type unique counts the one-batch
    run (and the batch COUNT(DISTINCT) oracle) produces — and assert
    the split actually crosses duplicate keys, so the test cannot pass
    vacuously."""
    import os

    from mapreduceinfrastructure_spark.sources.tables import (
        event_ts_us,
        load_table,
    )
    from mapreduceinfrastructure_spark.streaming.event_stream import (
        dedup_ingest_stream,
        run_stream_to_memory,
    )

    ev = load_table(spark, sf_dir, "events")
    ev_us = ev.withColumn("ts_us", event_ts_us(ev))
    median_us = ev_us.approxQuantile("ts_us", [0.5], 0.0)[0]
    lo = ev_us.filter(F.col("ts_us") <= median_us).drop("ts_us")
    hi = ev_us.filter(F.col("ts_us") > median_us).drop("ts_us")
    # the split must cross duplicate (user, type, day) keys
    key = [
        F.col("user_id"),
        F.col("event_type"),
        F.unix_date(F.col("ts").cast("date")).alias("day"),
    ]
    crossing = (
        lo.select(*key).distinct().intersect(hi.select(*key).distinct()).count()
    )
    assert crossing > 0, "time-median split produced no cross-batch dup keys"
    d = tmp_path / "dedup_stream"
    d.mkdir()
    lo.toPandas().to_parquet(d / "f1.parquet")
    hi.toPandas().to_parquet(d / "f2.parquet")
    os.utime(d / "f1.parquet", (1_000, 1_000))
    os.utime(d / "f2.parquet", (2_000, 2_000))
    schema = spark.read.parquet(str(d / "f1.parquet")).schema
    ds = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    if dict(ds.dtypes)["ts"] == "bigint":
        ds = ds.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ds = ds.withColumn("ts", F.col("ts").cast("timestamp"))
    got = run_stream_to_memory(spark, dedup_ingest_stream(ds), "dedup_xbatch")
    per_type = {
        r["event_type"]: r["n"]
        for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["event_type"]: r["n_unique"]
        for r in QUERIES["streaming_dedup_ingest"](spark, sf_dir).collect()
    }
    assert per_type == want, (per_type, want)


def test_containment_asymmetry_and_full_pairs(spark, sf_dir):
    """Containment must capture what Jaccard can't: the relation is
    DIRECTED (da->db membership does not imply db->da), full
    containments (containment == 1.0) exist in the planted corpus,
    and every reported pair's reverse direction, when absent, is
    absent because |B| > |A| made the reverse ratio smaller."""
    from mapreduceinfrastructure_spark.operators.dedup import CONTAINMENT_T

    rows = QUERIES["containment_neardup"](spark, sf_dir).collect()
    assert rows
    pairs = {(r["da"], r["db"]): r["containment"] for r in rows}
    assert all(c >= CONTAINMENT_T for c in pairs.values())
    assert any(abs(c - 1.0) < 1e-9 for c in pairs.values()), "no full containment found"
    sym = [p for p in pairs if (p[1], p[0]) in pairs]
    assert sym, "planted exact dups should contain each other both ways"
    # the advertised DIRECTED property, asserted concretely (ADVICE r8:
    # `asym` was computed but never checked — and at this SF the corpus
    # happens to contain no one-way pair, so non-emptiness is the wrong
    # assertion).  c(a→b) = |A∩B|/|A|, so the reverse direction is
    # exactly c·|A|/|B|: every absent reverse must be absent BECAUSE
    # that ratio falls below the threshold, and every present reverse
    # must equal it (up to the round(6) on the reported column).
    from mapreduceinfrastructure_spark.operators.dedup import _prefix_frames

    sizes = {
        r["doc_id"]: r["n"]
        for r in _prefix_frames(spark, sf_dir)[0].select("doc_id", "n").collect()
    }
    for (a, b), c in pairs.items():
        rev = c * sizes[a] / sizes[b]
        if (b, a) in pairs:
            assert abs(pairs[(b, a)] - rev) < 1e-5, ((a, b), pairs[(b, a)], rev)
        else:
            assert rev < CONTAINMENT_T + 1e-5, ((a, b), rev)


def test_containment_candidates_complete_vs_bruteforce(spark, sf_dir):
    """Completeness stated independently of the oracle: brute-force
    directed containment over the per-doc shingle lists (no prefix
    pruning) must equal the operator's result."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        CONTAINMENT_T,
        _prefix_frames,
    )

    by_doc, _ = _prefix_frames(spark, sf_dir)
    lists = by_doc.select("doc_id", F.col("s.shingle").alias("ss"), "n")
    la = lists.select(
        F.col("doc_id").alias("da"), F.col("ss").alias("sa"), F.col("n").alias("na")
    )
    lb = lists.select(F.col("doc_id").alias("db"), F.col("ss").alias("sb"))
    i = F.size(F.array_intersect("sa", "sb")).cast("long")
    brute = {
        (r["da"], r["db"])
        for r in la.crossJoin(lb)
        .filter(F.col("da") != F.col("db"))
        .select("da", "db", (i / F.col("na")).alias("c"))
        .filter(F.col("c") >= CONTAINMENT_T)
        .collect()
    }
    got = {
        (r["da"], r["db"])
        for r in QUERIES["containment_neardup"](spark, sf_dir).collect()
    }
    assert got == brute, got.symmetric_difference(brute)


def test_source_signature_shape_and_lift_semantics(spark, sf_dir):
    """Exactly K ranked rows per source (rank 1..K, lift
    non-increasing with token tiebreak), every signature token meets
    the support floor, and lift > 1 for the top pick (a source's most
    distinctive token is by definition over-represented)."""
    from mapreduceinfrastructure_spark.operators.pipeline import (
        SIGNATURE_K,
        SIGNATURE_MIN_SUPPORT,
    )

    rows = QUERIES["source_signature"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, SIGNATURE_K + 1)), src
        for r in rs:
            assert r["n_in_source"] >= SIGNATURE_MIN_SUPPORT
        for a, b in zip(rs, rs[1:]):
            assert a["lift"] > b["lift"] or (
                a["lift"] == b["lift"] and a["token"] < b["token"]
            )
        assert rs[0]["lift"] > 1.0, (src, rs[0])
