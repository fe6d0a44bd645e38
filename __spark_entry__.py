"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mapreduceinfrastructure_spark``; this module
is registry + oracle SQL only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduceinfrastructure_spark.operators import text_analysis as ta  # noqa: E402

# Delimiter class inside a SQL single-quoted string (the ' is doubled).
_D = "'[ ,.\"'']'"

# Shared CTE fragments for the DuckDB oracles (token pipelines).
_SQL_PAIRS = f"""
  WITH raw AS (
    SELECT doc_id, unnest(string_split_regex(text, {_D})) AS word FROM documents
  ), pairs AS (SELECT doc_id, word FROM raw WHERE length(word) > 0)
"""
_SQL_TOKS = f"""
  WITH toks AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(text, {_D}), x -> length(x) > 0) AS t
    FROM documents
  )
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's shipped word count) on sf0.001."""
    return ta.word_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "word_count": ta.word_count,
        "grep": ta.grep,
        "inverted_index": ta.inverted_index,
        "bigram_count": ta.bigram_count,
        "tf_idf": ta.tf_idf,
        "token_stats": ta.token_stats,
        "language_id": ta.language_id,
        "quality_score": ta.quality_score,
        "fingerprint": ta.fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    sw = ",".join(f"'{w}'" for w in ta.EN_STOPWORDS)
    return {
        "word_count": f"""
            {_SQL_PAIRS}
            SELECT word, count(*) AS cnt FROM pairs GROUP BY word
        """,
        "grep": """
            SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'fast join')
        """,
        "inverted_index": f"""
            {_SQL_PAIRS}
            SELECT word,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids,
                   count(DISTINCT doc_id) AS n_docs
            FROM pairs GROUP BY word
        """,
        "bigram_count": f"""
            {_SQL_TOKS}
            SELECT t[i] || ' ' || t[i + 1] AS bigram, count(*) AS cnt
            FROM toks, unnest(range(1, len(t))) AS u(i)
            GROUP BY bigram
        """,
        "tf_idf": f"""
            {_SQL_PAIRS},
            tf AS (SELECT doc_id, word, count(*) AS tf FROM pairs GROUP BY doc_id, word),
            idf AS (SELECT word, count(DISTINCT doc_id) AS df FROM pairs GROUP BY word),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT tf.doc_id, tf.word, round(tf.tf * ln(n.n / idf.df), 4) AS tfidf
            FROM tf JOIN idf USING (word) CROSS JOIN n
        """,
        "token_stats": f"""
            {_SQL_TOKS}
            SELECT doc_id,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   round(coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                         / greatest(len(t), 1), 4) AS avg_token_len
            FROM toks
        """,
        "language_id": f"""
            {_SQL_TOKS},
            s AS (
              SELECT doc_id,
                     len(list_filter(list_distinct(t),
                         x -> list_contains([{sw}], x)))::DOUBLE
                       / greatest(len(list_distinct(t)), 1) AS ratio
              FROM toks
            )
            SELECT doc_id, round(ratio, 4) AS stopword_ratio,
                   CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS predicted_lang
            FROM s
        """,
        "quality_score": f"""
            {_SQL_TOKS},
            m AS (
              SELECT doc_id, len(t) AS n_tokens,
                     coalesce(list_sum(list_transform(t, x -> length(x)::DOUBLE)), 0.0)
                       / greatest(len(t), 1) AS avg_len,
                     length(regexp_replace(text, '[^,.]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS punct_ratio
              FROM toks
            )
            SELECT doc_id, n_tokens, round(punct_ratio, 4) AS punct_ratio,
                   round(least(1.0, n_tokens / 100.0) * 0.5
                         + (1.0 - punct_ratio) * 0.3
                         + least(1.0, avg_len / 8.0) * 0.2, 4) AS quality
            FROM m
        """,
        "fingerprint": r"""
            SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
            FROM documents
        """,
    }
