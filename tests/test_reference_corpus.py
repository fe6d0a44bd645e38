"""Golden-output parity on the reference's own test corpus.

The reference's grading is golden-output comparison of the word-count
job over test/input/testdata_{1,2,3}.txt (SURVEY.md §5.1).  Here the
same corpus (read-only) runs through BOTH engine paths — the built-in
explode pipeline and the generic MapReduce layer — and must match an
independent pure-Python strtok-faithful oracle, including the
multi-file UNION-ALL concat semantics (file_shard.h:23).
"""

from __future__ import annotations

import glob
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.functions.text import tokens_expr
from mapreduceinfrastructure_spark.operators import mapreduce as mr
from mapreduceinfrastructure_spark.sources.text import read_text_lines

REF_INPUT = "/root/reference/test/input"
CORPUS = sorted(glob.glob(os.path.join(REF_INPUT, "testdata_*.txt")))

pytestmark = pytest.mark.skipif(
    not CORPUS, reason="reference corpus not present"
)


def python_oracle() -> Counter:
    """strtok(" ,.\"'") word count, straight from the file bytes."""
    counts: Counter = Counter()
    for path in CORPUS:
        with open(path, errors="surrogateescape") as f:
            for line in f:
                tok = []
                for ch in line.rstrip("\n"):
                    if ch in ' ,."\'':
                        if tok:
                            counts["".join(tok)] += 1
                            tok = []
                    else:
                        tok.append(ch)
                if tok:
                    counts["".join(tok)] += 1
    return counts


@pytest.fixture(scope="module")
def expected() -> Counter:
    return python_oracle()


def test_builtin_pipeline_matches_reference_corpus(spark, expected):
    lines = read_text_lines(spark, CORPUS)
    got = {
        r["word"]: r["cnt"]
        for r in (
            lines.select(F.explode(tokens_expr("value")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    assert got == dict(expected)


def test_mapreduce_layer_matches_reference_corpus(spark, expected):
    lines = read_text_lines(spark, CORPUS)
    kv = mr.map_reduce(lines, mr.wordcount_map, mr.wordcount_reduce, num_partitions=8)
    got = {r["key"]: int(r["value"]) for r in kv.collect()}
    assert got == dict(expected)


def test_corpus_totals(expected):
    # sanity against the measured corpus facts recorded in BASELINE.md
    assert sum(expected.values()) > 50_000
    assert len(expected) > 100


def test_spanning_sharder_full_reference_replay(spark, expected):
    """The complete reference scenario: its own corpus, its own
    config.ini shard size (map_kilobytes=500), split by the
    byte-faithful spanning sharder (testdata_1 is 342 KB, so the first
    500 KB shard must span into testdata_2 — the cross-file case), and
    word-counted with the strtok tokenizer.  Shard placement must be
    invisible in the result."""
    from mapreduceinfrastructure_spark.sources.sharding import (
        read_sharded_lines,
        shard_files,
    )

    shards = shard_files(CORPUS, map_kilobytes=500)
    spanning = [s for s in shards if len({p for p, _, _ in s}) >= 2]
    assert spanning, shards  # 342 KB + 43 KB + tail of file 3 in shard 0

    lines = read_sharded_lines(spark, CORPUS, map_kilobytes=500)
    got = {
        r["word"]: r["cnt"]
        for r in (
            lines.select(F.explode(tokens_expr("line")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    assert got == dict(expected)
