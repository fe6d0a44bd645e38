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


def _write_documents(tmp_path, name, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_ngram_novelty_correct_under_hot_gram_skew(spark, tmp_path):
    """ngram_novelty's join-back key is the 5-gram — boilerplate makes
    it a textbook hot key (VERDICT r5 #7).  300 docs share ONE
    boilerplate 5-gram (300x hotter than every content gram); the
    min-agg must absorb it map-side and the occurrence join back must
    still produce exact per-doc fractions."""
    from mapreduceinfrastructure_spark.operators.pipeline import ngram_novelty

    boiler = "b1 b2 b3 b4 b5"
    rows = [
        (i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e", "en", "s")
        for i in range(300)
    ]
    d = _write_documents(tmp_path, "novelty_skew", rows)
    got = {r["doc_id"]: r for r in ngram_novelty(spark, d).collect()}
    assert len(got) == 300
    # each doc has 10 tokens -> 6 distinct 5-grams; the boilerplate
    # gram belongs to doc 0, every other gram mentions u{i}* and is
    # unique to its doc
    assert got[0]["n_ngrams"] == 6 and got[0]["n_novel"] == 6
    assert got[0]["novelty"] == 1.0
    for i in range(1, 300):
        r = got[i]
        assert (r["n_ngrams"], r["n_novel"]) == (6, 5), r
        assert r["novelty"] == round(5 / 6, 6), r


def test_lang_entropy_correct_under_mega_source_skew(spark, tmp_path):
    """lang_entropy shuffles on the source key; one mega-source owning
    ~99% of docs is the skew case (VERDICT r5 #7).  The two-level
    algebraic shape must absorb it in map-side partials and produce
    the exact Shannon entropy."""
    import math

    from mapreduceinfrastructure_spark.operators.pipeline import lang_entropy

    rows = []
    nid = 0
    for lang, n in (("en", 1500), ("de", 400), ("fr", 100)):
        for _ in range(n):
            rows.append((nid, "x", lang, "mega"))
            nid += 1
    for _ in range(3):
        rows.append((nid, "x", "en", "tiny"))
        nid += 1
    d = _write_documents(tmp_path, "entropy_skew", rows)
    got = {r["source"]: r for r in lang_entropy(spark, d).collect()}

    ps = [1500 / 2000, 400 / 2000, 100 / 2000]
    ent = -sum(p * math.log(p) for p in ps)
    mega = got["mega"]
    assert (mega["n_langs"], mega["n_docs"], mega["majority_lang"]) == (3, 2000, "en")
    assert mega["entropy"] == round(ent, 6)
    assert mega["effective_langs"] == round(math.exp(ent), 6)
    tiny = got["tiny"]
    assert (tiny["n_langs"], tiny["n_docs"], tiny["entropy"]) == (1, 3, -0.0) or (
        tiny["n_langs"],
        tiny["n_docs"],
        tiny["entropy"],
    ) == (1, 3, 0.0)
    assert tiny["majority_lang"] == "en"


def test_bloom_decontaminate_exact_under_hot_gram_skew(spark, tmp_path):
    """VERDICT r6 #8: the bloom screen's hot-key candidate is a
    boilerplate benchmark gram shared by (almost) every training doc —
    its BLOOM_K bit positions occur in every probe row.  The
    broadcast-join + per-gram count shape must absorb that and keep
    the one-sided contract exact: every contaminated doc flagged,
    n_flagged_bloom - n_false_pos == n_flagged_exact per source."""
    from mapreduceinfrastructure_spark.operators.pipeline import (
        BENCH_MOD,
        bloom_decontaminate,
    )

    boiler = "c1 c2 c3 c4 c5"  # ONE 5-gram, in the benchmark and 190 train docs
    rows = [(0, boiler, "en", "bench")]  # doc 0: the benchmark item
    nid = 1
    for i in range(380):
        if nid % BENCH_MOD == 0:
            nid += 1  # keep extra docs out of the benchmark split
        contaminated = i % 2 == 0
        text = (
            f"{boiler} u{nid}a u{nid}b u{nid}c u{nid}d"
            if contaminated
            else f"z{nid}a z{nid}b z{nid}c z{nid}d z{nid}e z{nid}f"
        )
        rows.append((nid, text, "en", "s_hot" if contaminated else "s_clean"))
        nid += 1
    d = _write_documents(tmp_path, "bloom_skew", rows)
    got = {r["source"]: r for r in bloom_decontaminate(spark, d).collect()}
    hot, clean = got["s_hot"], got["s_clean"]
    assert hot["n_docs"] == 190 and clean["n_docs"] == 190
    # one-sided: every contaminated doc is exactly- AND bloom-flagged
    assert hot["n_flagged_exact"] == 190
    assert hot["n_flagged_bloom"] - hot["n_false_pos"] == 190
    assert clean["n_flagged_exact"] == 0
    assert clean["n_flagged_bloom"] == clean["n_false_pos"]


def test_semdedup_prune_exact_under_giant_cluster_skew(spark, tmp_path):
    """VERDICT r6 #8: semdedup_prune's hot key is a cluster owning the
    whole corpus.  400 copies of one vector tie to centroid 0 (argmin
    tie-break takes the lowest cid), so cluster 0 holds ALL vectors
    and the pair join is fully quadratic on one key — the salted,
    width-pinned join must spread it and still return the exact
    one-shot-prune answer: keep vec 0, prune the other 399."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.similarity import semdedup_prune

    rng = np.random.default_rng(17)
    v0 = rng.standard_normal(64)
    vecs = np.tile(v0, (400, 1))
    t = pa.table(
        {
            "vec_id": pa.array(range(400), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array([0] * 400, type=pa.int32()),
        }
    )
    d = tmp_path / "semdedup_giant"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")
    rows = {r["cluster"]: r for r in semdedup_prune(spark, str(d)).collect()}
    assert set(rows) == {0}, rows  # every vector in the one giant cluster
    r = rows[0]
    assert (r["n"], r["n_kept"], r["n_pruned"]) == (400, 1, 399), r


def test_prefix_filter_exact_under_all_neardup_corpus(spark, tmp_path):
    """Worst case for prefix filtering: a corpus where EVERY pair
    qualifies (the candidate set is inherently quadratic — no scheme
    can prune it).  60 docs share 19 of ~20 shingles (one distinct
    word each at a fixed position); the operator must return exactly
    C(60,2) pairs with exact Jaccard, i.e. the prefix join degrades
    to the full join without losing or fabricating pairs."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        PREFIX_JACCARD_T,
        prefix_filter_neardup,
    )

    base = [f"w{j}" for j in range(22)]
    rows = []
    for i in range(60):
        toks = list(base)
        toks[10] = f"u{i}"  # one unique token mid-doc
        rows.append((i, " ".join(toks), "en", "s"))
    d = _write_documents(tmp_path, "prefix_allpairs", rows)
    got = prefix_filter_neardup(spark, d).collect()
    n = 60 * 59 // 2
    assert len(got) == n, len(got)
    # shared shingles: the 3 shingles starting at positions 8-10 touch
    # the unique token -> 17 of each doc's 20 are shared;
    # jaccard = 17 / (20 + 20 - 17)
    expect = round(17 / 23, 6)
    assert all(r["jaccard"] == expect for r in got)
    assert 17 / 23 >= PREFIX_JACCARD_T  # the pairs genuinely qualify
