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
