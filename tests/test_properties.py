"""Property-based tests (hypothesis): the Spark tokenizer and the
MapReduce layer against independent Python models on arbitrary input."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.functions.text import tokens_expr
from mapreduceinfrastructure_spark.operators.mapreduce import wordcount_map

# text over the delimiter class + word chars, incl. consecutive delims
TEXT = st.text(
    alphabet=st.sampled_from(list("ab xy,.\"'z")), min_size=0, max_size=60
)


def py_tokens(line: str) -> list[str]:
    out, tok = [], []
    for ch in line:
        if ch in ' ,."\'':
            if tok:
                out.append("".join(tok))
                tok = []
        else:
            tok.append(ch)
    if tok:
        out.append("".join(tok))
    return out


@given(st.lists(TEXT, min_size=1, max_size=8))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_spark_tokenizer_matches_python_model(spark, lines):
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    got = [r["t"] for r in df.select(tokens_expr("value").alias("t")).collect()]
    assert got == [py_tokens(line) for line in lines]


@given(TEXT)
@settings(max_examples=50, deadline=None)
def test_wordcount_map_is_strtok_faithful(line):
    got = [k for k, _ in wordcount_map(line)]
    assert got == py_tokens(line)
    assert all(tok for tok in got)  # never an empty token


@given(st.lists(TEXT, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_explode_count_equals_multiset(spark, lines):
    """groupBy.count over exploded tokens == Python multiset, any input."""
    df = spark.createDataFrame([(line,) for line in lines], "value string")
    rows = (
        df.select(F.explode(tokens_expr("value")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    want = Counter(t for line in lines for t in py_tokens(line))
    assert {r["w"]: r["c"] for r in rows} == dict(want)


def test_rows_only_queries_are_deterministic(spark, sf_dir):
    """The rows-only queries (no DuckDB oracle pins them) must still
    be run-to-run deterministic — seeded LSH planes, fixed IVF init.
    Two runs, identical sorted rows."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    rows_only = sorted(set(qs) - set(entrymod.oracle_sql()))
    for name in rows_only:
        a = sorted(map(tuple, qs[name](spark, sf_dir).collect()))
        b = sorted(map(tuple, qs[name](spark, sf_dir).collect()))
        assert a == b, f"{name} not deterministic across runs"
        assert a, f"{name} returned no rows at sf0.01"
