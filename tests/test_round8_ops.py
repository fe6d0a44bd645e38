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
    import tempfile

    app = spark.sparkContext.applicationId.replace("-", "_")
    root = os.path.join(
        tempfile.gettempdir(),
        f"mri_mor_{os.path.basename(os.path.normpath(sf_dir))}_{app}",
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
