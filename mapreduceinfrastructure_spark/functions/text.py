"""Reusable text column-expression builders (JVM-side, codegen-friendly).

Tokenizer fidelity (SURVEY.md §7 risk register): the reference's shipped
word-count mapper tokenizes with strtok_r over the delimiter class
`" ,.\"'"` (test/user_tasks.cc:15).  strtok collapses consecutive
delimiters and never yields empty tokens, so the Spark equivalent is
split-on-class + filter(length > 0).  All of this stays inside
whole-stage codegen — no Python UDF in the hot path.
"""

from __future__ import annotations

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
