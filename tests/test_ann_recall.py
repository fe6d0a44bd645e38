"""ANN quality: the approximate paths must substantially agree with the
exact brute-force baseline (recall), not just run."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["neighbor_id"])
    return out


def test_ann_lsh_recall(spark, sf_dir):
    exact = _topk_sets(QUERIES["cosine_topk"](spark, sf_dir))
    approx = _topk_sets(QUERIES["ann_lsh"](spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    # 8 independent 4-bit tables + 1-bit query multiprobe: per-table
    # P(hit) = p^4 + 4p^3(1-p) ≥ 0.36 even at cosine≈0, so overall
    # recall should be near 1; 0.5 is the hard floor for "usable ANN".
    assert hits / total >= 0.5, f"LSH recall {hits}/{total}"


def test_ann_ivf_recall(spark, sf_dir):
    exact = _topk_sets(QUERIES["cosine_topk"](spark, sf_dir))
    approx = _topk_sets(QUERIES["ann_ivf"](spark, sf_dir))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.3, f"IVF recall {hits}/{total}"


def test_minhash_lsh_catches_high_jaccard_pairs(spark, sf_dir):
    """LSH with b=8,r=4 must catch essentially every pair with J≥0.8
    (P(miss) = (1-J^4)^8 ≤ 0.03 at J=0.8)."""
    exact = {
        (r["da"], r["db"])
        for r in QUERIES["ngram_jaccard_neardup"](spark, sf_dir).collect()
        if r["jaccard"] >= 0.8
    }
    lsh = {
        (r["da"], r["db"])
        for r in QUERIES["minhash_lsh_neardup"](spark, sf_dir).collect()
    }
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"missed {missed}"
