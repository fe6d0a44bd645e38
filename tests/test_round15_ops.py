"""Round-15 invariants: the residual-ADC search path (ivf_pq_adc_topk)
and the raw-vs-residual IVF-PQ audit (ivf_pq_recall_report).  Oracle
parity, plan pins, and empty-input behavior live in their own suites;
these pin the rank-list structure and the audit's internal consistency."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_ivf_pq_adc_topk_ranklist_structure(spark, sf_dir):
    """Per query: self excluded, rn dense from 1, at most TOPK rows,
    adc_d2 non-decreasing in rn (the window's own order restated on
    the output — catches any post-window reordering regression)."""
    from mapreduceinfrastructure_spark.operators.similarity import TOPK

    rows = QUERIES["ivf_pq_adc_topk"](spark, sf_dir).collect()
    assert rows, "residual ADC returned nothing"
    per_q: dict[int, list] = {}
    for r in rows:
        assert r["qid"] != r["neighbor_id"]
        per_q.setdefault(r["qid"], []).append((r["rn"], r["adc_d2"]))
    for qid, lst in per_q.items():
        lst.sort()
        rns = [rn for rn, _ in lst]
        assert rns == list(range(1, len(rns) + 1)), (qid, rns)
        assert len(rns) <= TOPK
        ds = [d for _, d in lst]
        assert ds == sorted(ds), (qid, ds)


def test_ivf_pq_recall_report_consistency(spark, sf_dir):
    """The audit's hits must equal an independent intersection of its
    own two rank lists with the exact list it divides by: full
    (variant x qid) grid, hits <= n_exact, and the 'raw' leg must
    reproduce ann_ivf_adc's hits (it IS that operator's rank list)."""
    rep = QUERIES["ivf_pq_recall_report"](spark, sf_dir).collect()
    assert rep
    grid: dict[tuple, dict] = {}
    for r in rep:
        grid[(r["variant"], r["qid"])] = r
        assert 0 <= r["hits"] <= r["n_exact"], r
    qids = {q for _, q in grid}
    assert {(v, q) for v in ("raw", "residual") for q in qids} == set(grid)

    raw = {
        (r["qid"], r["neighbor_id"])
        for r in QUERIES["ann_ivf_adc"](spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F
    from mapreduceinfrastructure_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
        _embeddings,
    )
    from pyspark.sql import Window

    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("neighbor_id"))
    exact = {
        (r["qid"], r["neighbor_id"])
        for r in emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .collect()
    }
    for qid in qids:
        want = len({p for p in raw & exact if p[0] == qid})
        assert grid[("raw", qid)]["hits"] == want, (qid, want)


def test_ann_filtered_topk_language_invariants(spark, sf_dir):
    """Every neighbor shares the query document's language; rn dense
    from 1 per qid; self excluded; and the result equals a local
    recompute of same-lang exact top-k from the parquet (first
    principles, no Spark or DuckDB machinery shared)."""
    import math

    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    rows = QUERIES["ann_filtered_topk"](spark, sf_dir).collect()
    assert rows

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(
            t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
        )
    }
    d = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    lang = dict(zip(d.column("doc_id").to_pylist(), d.column("lang").to_pylist()))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    per_q: dict[int, list] = {}
    for r in rows:
        assert r["qid"] != r["neighbor_id"]
        assert r["lang"] == lang[r["neighbor_id"]] == lang[r["qid"]]
        per_q.setdefault(r["qid"], []).append((r["rn"], r["neighbor_id"]))
    for qid, lst in per_q.items():
        lst.sort()
        assert [rn for rn, _ in lst] == list(range(1, len(lst) + 1))
        want = sorted(
            (i for i in vecs if i != qid and lang[i] == lang[qid]),
            key=lambda i: (-cos(vecs[qid], vecs[i]), i),
        )[:TOPK]
        assert [n for _, n in lst] == want, (qid, lst, want)
    # every query with at least one same-lang peer appears
    expected_qids = {
        i
        for i in vecs
        if i < N_QUERIES
        and any(j != i and lang[j] == lang[i] for j in vecs)
    }
    assert set(per_q) == expected_qids


def test_filtered_ann_recall_report_grid(spark, sf_dir):
    """One row per qid with same-lang exact neighbors; hits bounded by
    n_exact; and the exact leg's qid set equals ann_filtered_topk's."""
    rep = QUERIES["filtered_ann_recall_report"](spark, sf_dir).collect()
    assert rep
    qids = set()
    for r in rep:
        assert r["qid"] not in qids  # one row per qid
        qids.add(r["qid"])
        assert 0 <= r["n_hit"] <= r["n_exact"]
    exact_qids = {
        r["qid"] for r in QUERIES["ann_filtered_topk"](spark, sf_dir).collect()
    }
    assert qids == exact_qids


def test_streaming_cell_occupancy_partitions_corpus(spark, sf_dir):
    """The occupancy table partitions the corpus: counts sum to the
    corpus size, every cid is a seed id, id ranges are sane, and the
    table equals a batch recompute via ivf-seed assignment."""
    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.operators.similarity import (
        N_CLUSTERS_MOD,
        _embeddings,
    )

    rows = QUERIES["streaming_cell_occupancy"](spark, sf_dir).collect()
    assert rows
    n = _embeddings(spark, sf_dir).count()
    assert sum(r["n_vectors"] for r in rows) == n
    for r in rows:
        assert r["cid"] % N_CLUSTERS_MOD == 0
        assert 0 <= r["min_vec_id"] <= r["max_vec_id"]
        assert r["n_vectors"] >= 1


def test_adc_rerank_beats_pure_adc(spark, sf_dir):
    """The point of the second stage: recall@TOPK vs exact L2 must be
    at least pure ADC's (any true neighbor the CAP retains gets
    ranked correctly by the exact re-rank; measured 0.172 -> 0.416 at
    sf0.01).  Also pins the structural invariants (self excluded, rn
    dense, d2 non-decreasing)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mapreduceinfrastructure_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
        _embeddings,
    )

    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("neighbor_id"))
    exact = {
        (r["qid"], r["neighbor_id"])
        for r in emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .collect()
    }

    rr_rows = QUERIES["adc_rerank_topk"](spark, sf_dir).collect()
    per_q: dict[int, list] = {}
    for r in rr_rows:
        assert r["qid"] != r["neighbor_id"]
        per_q.setdefault(r["qid"], []).append((r["rn"], r["d2"]))
    for qid, lst in per_q.items():
        lst.sort()
        assert [rn for rn, _ in lst] == list(range(1, len(lst) + 1))
        ds = [d for _, d in lst]
        assert ds == sorted(ds)

    rr = {(r["qid"], r["neighbor_id"]) for r in rr_rows}
    adc = {
        (r["qid"], r["neighbor_id"])
        for r in QUERIES["pq_adc_topk"](spark, sf_dir).collect()
    }
    assert len(rr & exact) >= len(adc & exact), (
        len(rr & exact),
        len(adc & exact),
    )


def test_trained_pq_quantize_matches_python_reference(spark, sf_dir):
    """The r15 trained production encode vs a pure-numpy recomputation
    from the parquet vectors — seed codebook (vec_id < PQ_K), 3 Lloyd
    iterations (per-subspace argmin with j-ascending fold and
    lowest-code ties, per-(code, position) mean re-centering, emptied
    cells keeping the previous value), final encode.  Ground truth
    from first principles: the DuckDB oracle REPLAYS the same
    recurrence, so this is the independent check that both engines
    aren't sharing a bug in the training algebra (the seed-path
    pure-Python references in test_round12/13 cover only the env-gated
    A/B twin since r15)."""
    import numpy as np
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.similarity import (
        PQ_K,
        PQ_SUB,
        PQ_SUBDIM,
        PQ_TRAIN_ITERS,
        pq_quantize,
    )

    got = {
        (r["vec_id"], r["subspace"]): (r["code"], r["sq_err"])
        for r in pq_quantize(spark, sf_dir).collect()
    }

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = sorted(int(x) for x in t["vec_id"].to_pylist())
    vecs = {
        int(i): np.array(v, dtype=np.float64)
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    seeds = [i for i in ids if i < PQ_K]
    dim = len(next(iter(vecs.values())))
    cb = np.stack([vecs[i] for i in seeds])  # (n_codes, dim)
    n_codes = len(seeds)

    def assign(codebook):
        # per (vec, subspace): argmin over codes, ties to lowest pos
        out = {}
        for i in ids:
            for s in range(PQ_SUB):
                lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
                d = ((vecs[i][lo:hi] - codebook[:, lo:hi]) ** 2).sum(axis=1)
                p = int(np.argmin(d))  # first minimal = lowest pos
                out[(i, s)] = (p, float(d[p]))
        return out

    for _ in range(PQ_TRAIN_ITERS):
        a = assign(cb)
        nxt = cb.copy()
        for p in range(n_codes):
            for s in range(PQ_SUB):
                members = [i for i in ids if a[(i, s)][0] == p]
                if members:
                    lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
                    nxt[p, lo:hi] = np.mean(
                        [vecs[i][lo:hi] for i in members], axis=0
                    )
        cb = nxt

    final = assign(cb)
    assert set(got) == set(final)
    for (i, s), (p, d) in final.items():
        gc, gd = got[(i, s)]
        assert gc == seeds[p], ((i, s), gc, seeds[p])
        assert abs(gd - round(d, 6)) <= 2e-6, ((i, s), gd, d)
