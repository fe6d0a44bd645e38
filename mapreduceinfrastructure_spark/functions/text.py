"""Reusable text column-expression builders (JVM-side, codegen-friendly).

Tokenizer fidelity (SURVEY.md §7 risk register): the reference's shipped
word-count mapper tokenizes with strtok_r over the delimiter class
`" ,.\"'"` (test/user_tasks.cc:15).  strtok collapses consecutive
delimiters and never yields empty tokens, so the Spark equivalent is
split-on-class + filter(length > 0).  All of this stays inside
whole-stage codegen — no Python UDF in the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex class equivalent of the reference's strtok delimiters " ,.\"'"
# (test/user_tasks.cc:15).  Kept identical in the DuckDB oracles.
DELIM_CLASS = "[ ,.\"']"


def tokens_expr(col: Column | str, delim_class: str = DELIM_CLASS) -> Column:
    """Array of non-empty tokens — strtok-faithful (drops empty tokens
    produced by consecutive delimiters)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, delim_class), lambda x: F.length(x) > 0)


def bigrams_expr(tokens: Column) -> Column:
    """Adjacent-token bigrams "w1 w2" from a token array.

    Guarded for size < 2 because Spark's ``sequence(1, 0)`` produces a
    *descending* sequence rather than an empty array.
    """
    return ngrams_expr(tokens, 2)


def ngrams_expr(tokens: Column, n: int) -> Column:
    """Space-joined token n-grams from a token array (generalizes
    :func:`bigrams_expr`).

    Same ``sequence`` guard: for size < n Spark's ``sequence(1, k<1)``
    is a *descending* sequence, not empty.  ``element_at`` indices are
    always in-bounds here, so the expression is ANSI-mode safe.
    """
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


class QualitySignals(NamedTuple):
    """Column bundle produced by :func:`quality_signals`."""

    n_tokens: Column
    avg_token_len: Column
    punct_ratio: Column
    quality: Column


def quality_signals(text: Column | str, tokens: Column | None = None) -> QualitySignals:
    """THE document quality score — single definition for the linear
    heuristic used by text_analysis.quality_score, the curation
    pipeline's q >= 0.5 gate, corpus_summary's mean_quality, and the
    streaming ingest gate (one threshold-bearing formula, one home;
    VERDICT r5 #4):

        quality = min(1, n_tokens/100) * 0.5
                + (1 - punct_ratio)    * 0.3
                + min(1, avg_len/8)    * 0.2

    All pieces are codegen expressions over the text column (and the
    token array, built here unless the caller already materialized
    one).  Callers that compare against thresholds round to 6 decimals
    first so the boundary decision is representation-stable across
    engines; the DuckDB oracles carry the identical formula.
    """
    text_c = F.col(text) if isinstance(text, str) else text
    toks = tokens_expr(text_c) if tokens is None else tokens
    n_tokens = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0.0), lambda a, x: a + F.length(x).cast("double")
    )
    avg_len = total_len / F.greatest(n_tokens, F.lit(1)).cast("double")
    n_punct = F.length(F.regexp_replace(text_c, "[^,.]", ""))
    punct_ratio = n_punct.cast("double") / F.greatest(
        F.length(text_c), F.lit(1)
    ).cast("double")
    quality = (
        F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * 0.5
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(F.lit(1.0), avg_len / 8.0) * 0.2
    )
    return QualitySignals(n_tokens, avg_len, punct_ratio, quality)


def normalized_fingerprint(text: Column | str) -> Column:
    """Exact-dup fingerprint: md5 of lowercased, whitespace-collapsed
    text — the one normalization every exact-dedup surface shares."""
    text_c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(text_c), r"\s+", " "))
