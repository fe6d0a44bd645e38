"""Cross-operator invariants for the round-5 analytics — checks that
hold by construction and tie the new operators to the established ones,
so a regression in either side breaks a visible equation (stronger than
each operator's standalone oracle parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def test_novelty_mass_equals_distinct_gram_count(spark, sf_dir):
    """Each distinct corpus 5-gram has exactly one first owner, so the
    sum of per-doc novel counts must equal the number of distinct
    5-grams corpus-wide; and every doc's novelty sits in [0, 1]."""
    nov = QUERIES["ngram_novelty"](spark, sf_dir)
    rows = nov.collect()
    assert all(0.0 <= r["novelty"] <= 1.0 for r in rows)
    total_novel = sum(r["n_novel"] for r in rows)

    from mapreduceinfrastructure_spark.functions.text import (
        ngrams_expr,
        tokens_expr,
    )
    from mapreduceinfrastructure_spark.operators.pipeline import NGRAM_N
    from mapreduceinfrastructure_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    distinct_grams = (
        docs.select(
            F.explode(
                F.array_distinct(ngrams_expr(tokens_expr("text"), NGRAM_N))
            ).alias("g")
        )
        .agg(F.countDistinct("g"))
        .collect()[0][0]
    )
    assert total_novel == distinct_grams


def test_corpus_summary_ties_to_component_queries(spark, sf_dir):
    """The dashboard numbers must equal what the dedicated operators
    report: n_docs/n_tokens from token_stats, vocab from word_count,
    exact_dup_rate from dedup_exact's fingerprint groups."""
    s = QUERIES["corpus_summary"](spark, sf_dir).collect()[0]

    ts = QUERIES["token_stats"](spark, sf_dir).agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    ).collect()[0]
    assert s["n_docs"] == ts["n_docs"]
    assert s["n_tokens"] == ts["n_tokens"]

    vocab = QUERIES["word_count"](spark, sf_dir).count()
    assert s["vocab_size"] == vocab

    fp_groups = QUERIES["dedup_exact"](spark, sf_dir).count()
    expect_rate = round(1.0 - fp_groups / s["n_docs"], 6)
    assert abs(s["exact_dup_rate"] - expect_rate) < 1e-9


def test_lang_entropy_information_bounds(spark, sf_dir):
    """Shannon bounds: 0 <= H <= ln(n_langs); 1 <= exp(H) <= n_langs;
    and a source's majority language must actually be one of its
    languages with the plurality doc count."""
    rows = QUERIES["lang_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy"] <= math.log(r["n_langs"]) + 1e-9
        assert 1.0 - 1e-9 <= r["effective_langs"] <= r["n_langs"] + 1e-9

    from mapreduceinfrastructure_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = {
        (x["source"], x["lang"]): x["n"]
        for x in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        best_n = max(n for (s, _), n in counts.items() if s == r["source"])
        assert counts[(r["source"], r["majority_lang"])] == best_n


def test_cdc_and_span_dedup_agree_on_exact_duplicates(spark, sf_dir):
    """Exact whole-doc duplicates must score dup_frac 1.0 under BOTH
    substring-span and CDC chunking (identical bytes => identical
    boundaries => identical chunks) whenever they have any chunk/span
    at all — the two operators may disagree on near-dups, never on
    exact ones."""
    dups = (
        QUERIES["dedup_exact"](spark, sf_dir)
        .filter(F.col("dup_cnt") >= 2)
        .collect()
    )
    if not dups:
        import pytest

        pytest.skip("no exact duplicates at this SF")
    dup_keep = {r["keep_id"] for r in dups}
    for name in ("dup_spans", "cdc_dup_chunks"):
        out = {r["doc_id"]: r["dup_frac"] for r in QUERIES[name](spark, sf_dir).collect()}
        for d in dup_keep:
            if d in out:  # docs long enough to have spans/chunks
                assert out[d] == 1.0, (name, d, out[d])
