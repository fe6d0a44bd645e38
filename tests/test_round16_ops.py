"""Round-16 invariants: the composed production retrieval query
(ivf_pq_rerank_topk — IVF prefilter → residual ADC → exact re-rank)
and its equal-budget audit (ivf_pq_rerank_recall_report).  Oracle
parity, plan pins, and empty-input behavior live in their own suites;
these pin the composition's internal consistency and the measured
recall the re-rank stage buys."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_ivf_pq_rerank_ranklist_structure(spark, sf_dir):
    """Per query: self excluded, rn dense from 1, at most TOPK rows,
    d2 non-decreasing in rn, and every returned neighbor must come
    from the stage-1 candidate pool (the rn <= RERANK_CAP prefix of
    the IVFADC ranking) — the composition contract."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        RERANK_CAP,
        TOPK,
        _ivf_pq_adc_ranked,
    )

    rows = QUERIES["ivf_pq_rerank_topk"](spark, sf_dir).collect()
    assert rows, "composed retrieval returned nothing"
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["qid"] != r["neighbor_id"]
        per_q.setdefault(r["qid"], []).append((r["rn"], r["d2"]))
    for qid, lst in per_q.items():
        lst.sort()
        rns = [rn for rn, _ in lst]
        assert rns == list(range(1, len(rns) + 1)), (qid, rns)
        assert len(rns) <= TOPK
        ds = [d for _, d in lst]
        assert ds == sorted(ds), (qid, ds)

    cand = {
        (r["qid"], r["neighbor_id"])
        for r in _ivf_pq_adc_ranked(spark, sf_dir, RERANK_CAP).collect()
    }
    got = {(r["qid"], r["neighbor_id"]) for r in rows}
    assert got <= cand, "re-rank surfaced a neighbor outside the CAP pool"


def test_ivf_pq_adc_topk_is_cap_ranking_prefix(spark, sf_dir):
    """The shared-ranking contract behind the r16 refactor: the
    rn <= TOPK prefix of the cap=RERANK_CAP ranking must equal
    ivf_pq_adc_topk's output exactly (one ranking, two consumers —
    what lets the recall report price both variants from one
    candidate pass)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        RERANK_CAP,
        TOPK,
        _ivf_pq_adc_ranked,
    )

    ranked = _ivf_pq_adc_ranked(spark, sf_dir, RERANK_CAP)
    prefix = {
        (r["qid"], r["neighbor_id"], r["rn"])
        for r in ranked.filter(ranked["rn"] <= TOPK).collect()
    }
    full = {
        (r["qid"], r["neighbor_id"], r["rn"])
        for r in QUERIES["ivf_pq_adc_topk"](spark, sf_dir).collect()
    }
    assert prefix == full


def test_ivf_pq_rerank_recall_report_consistency(spark, sf_dir):
    """Full (variant x qid) grid, hits <= n_exact, the 'rerank' leg
    reproduces ivf_pq_rerank_topk's hits (it IS that operator's rank
    list), and the measured headline: exact re-rank at equal
    candidate budget (CAP=25) lifts mean recall@5 strictly above the
    compressed-domain ranks — 0.156 -> 0.364 at sf0.01, 0.112 ->
    0.244 at sf0.1 (the Jégou §V re-ranking claim priced on this
    corpus)."""
    rep = QUERIES["ivf_pq_rerank_recall_report"](spark, sf_dir).collect()
    assert rep
    grid: dict[tuple, dict] = {}
    for r in rep:
        grid[(r["variant"], r["qid"])] = r
        assert 0 <= r["hits"] <= r["n_exact"], r
    qids = {q for _, q in grid}
    assert {(v, q) for v in ("ivfadc", "rerank") for q in qids} == set(grid)

    rer = {
        (r["qid"], r["neighbor_id"])
        for r in QUERIES["ivf_pq_rerank_topk"](spark, sf_dir).collect()
    }
    for (variant, qid), r in grid.items():
        if variant == "rerank":
            got_q = {n for q, n in rer if q == qid}
            assert r["hits"] <= len(got_q) or not got_q

    mean = {v: 0.0 for v in ("ivfadc", "rerank")}
    cnt = {v: 0 for v in ("ivfadc", "rerank")}
    for (variant, _), r in grid.items():
        mean[variant] += r["recall"]
        cnt[variant] += 1
    m_adc = mean["ivfadc"] / cnt["ivfadc"]
    m_rer = mean["rerank"] / cnt["rerank"]
    assert m_rer > m_adc, (m_adc, m_rer)
    if sf_dir.rstrip("/").endswith("sf0.01"):
        assert abs(m_adc - 0.156) < 1e-9, m_adc
        assert abs(m_rer - 0.364) < 1e-9, m_rer


def test_ivf_pq_probe_sweep_consistency(spark, sf_dir):
    """Full (nprobe x qid) grid over ANN_PROBE_SET, n_hit <= n_exact,
    and the nprobe=NPROBE row must bit-equal ivf_pq_recall_report's
    'residual' variant (same path, same ground truth — the sweep is
    that report swept across operating points).  NO monotonicity pin:
    ADC ranks by quantized distance, so more probed cells can
    displace a true neighbor (documented in the docstring; the
    measured curve lives in SCALE.md)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        ANN_PROBE_SET,
        NPROBE,
    )

    sweep = QUERIES["ivf_pq_probe_sweep"](spark, sf_dir).collect()
    assert sweep
    grid = {(r["nprobe"], r["qid"]): r for r in sweep}
    qids = {q for _, q in grid}
    assert {(p, q) for p in ANN_PROBE_SET for q in qids} == set(grid)
    for r in sweep:
        assert 0 <= r["n_hit"] <= r["n_exact"], r

    rep = {
        r["qid"]: (r["hits"], r["recall"])
        for r in QUERIES["ivf_pq_recall_report"](spark, sf_dir).collect()
        if r["variant"] == "residual"
    }
    for qid, (hits, recall) in rep.items():
        r = grid[(NPROBE, qid)]
        assert (r["n_hit"], r["recall"]) == (hits, recall), (qid, r)


def test_streaming_pq_ingest_matches_batch_encode(spark, sf_dir):
    """The streaming index writer's in-row encode IS the batch path:
    the run-to-completion posting histogram must bit-equal
    ivf_pq_residual's output aggregated by (cid, subspace, code) —
    same centroid/codebook literals, same folds, same tie rules."""
    from pyspark.sql import functions as F

    got = {
        tuple(r)
        for r in QUERIES["streaming_pq_ingest"](spark, sf_dir).collect()
    }
    exp = {
        tuple(r)
        for r in QUERIES["ivf_pq_residual"](spark, sf_dir)
        .groupBy("cid", "subspace", "code")
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.min("vec_id").cast("long").alias("min_vec_id"),
            F.max("vec_id").cast("long").alias("max_vec_id"),
        )
        .collect()
    }
    assert got == exp
    assert got, "empty histogram on a non-empty corpus"


def test_global_shuffle_shards_partition_properties(spark, sf_dir):
    """The output is a true permutation into shards: every document
    appears exactly once, positions are dense 1..|shard| within each
    shard, and the md5-keyed multinomial keeps shards balanced (no
    shard more than twice the smallest at test scale — the no-skew-
    by-construction claim)."""
    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = QUERIES["global_shuffle_shards"](spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    per_shard: dict[int, list] = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    sizes = sorted(len(v) for v in per_shard.values())
    assert sizes[-1] <= 2 * sizes[0], sizes


def test_ivf_split_plan_invariants(spark, sf_dir):
    """Every planned split targets a genuinely overfull cell (count
    above the all-cell average recomputed independently), the split
    seed is a member of its own cell, and max_d2 is that member's
    own-centroid distance restated."""
    from pyspark.sql import functions as F
    from mapreduceinfrastructure_spark.operators.similarity import (
        _sq_dist,
        ivf_assignments,
    )

    plan = {
        r["cid"]: r for r in QUERIES["ivf_split_plan"](spark, sf_dir).collect()
    }
    assert plan, "no overfull cells at test geometry (unexpected)"
    assign, cents = ivf_assignments(spark, sf_dir)
    sizes = {
        r["cid"]: r["n"]
        for r in assign.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    avg_n = sum(sizes.values()) / len(sizes)
    for cid, r in plan.items():
        assert sizes[cid] == r["n_vectors"]
        assert r["n_vectors"] > avg_n, (cid, r["n_vectors"], avg_n)
    overfull = {c for c, n in sizes.items() if n > avg_n}
    assert overfull == set(plan), "threshold mismatch"

    memb = {
        (r["cid"], r["vec_id"]): r["d2"]
        for r in assign.join(F.broadcast(cents), "cid")
        .select(
            "cid", "vec_id", F.round(_sq_dist(F.col("v"), F.col("cv")), 6).alias("d2")
        )
        .collect()
    }
    for cid, r in plan.items():
        assert (cid, r["split_seed"]) in memb, "seed not a cell member"
        assert memb[(cid, r["split_seed"])] == r["max_d2"]
