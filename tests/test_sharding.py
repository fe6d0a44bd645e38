"""Cross-file shard spanning — the reference's split semantics that
Spark's per-file reader cannot express, reproduced and proven:
line-aligned byte-budget shards that carry a partial budget across
file boundaries (file_shard.h:18-42)."""

from __future__ import annotations

import pytest

from mapreduceinfrastructure_spark.sources.sharding import (
    read_sharded_lines,
    shard_files,
)


@pytest.fixture()
def three_files(tmp_path):
    paths = []
    for i, n_lines in enumerate((37, 11, 53)):
        p = tmp_path / f"in{i}.txt"
        p.write_text(
            "".join(f"file{i} line{j} some words here\n" for j in range(n_lines))
        )
        paths.append(str(p))
    return paths


def test_shards_are_line_aligned_and_budget_sized(three_files):
    shards = shard_files(three_files, map_kilobytes=1)
    # every CLOSED shard (all but the last) spent its full budget
    for shard in shards[:-1]:
        total = sum(end - start for _, start, end in shard)
        assert total >= 1024
        # and closes at a line boundary: each piece's end lands on a
        # newline (or EOF+1 for a phantom final newline)
        for path, start, end in shard:
            data = open(path, "rb").read()
            assert end == len(data) + (0 if data.endswith(b"\n") else 1) or (
                data[end - 1 : end] == b"\n"
            )


def test_some_shard_spans_two_files(three_files):
    """The defining behavior: with budgets that do not divide the file
    sizes, at least one shard holds pieces of two different files."""
    shards = shard_files(three_files, map_kilobytes=1)
    spanning = [s for s in shards if len({p for p, _, _ in s}) >= 2]
    assert spanning, shards


def test_sharded_read_reconstructs_all_lines(spark, three_files):
    want = []
    for p in three_files:
        want.extend(open(p).read().splitlines())
    for kb in (1, 2, 64):
        df = read_sharded_lines(spark, three_files, map_kilobytes=kb)
        rows = df.collect()
        # every line appears exactly once across the shard set
        got = [r["line"] for r in rows]
        assert sorted(got) == sorted(want), kb
    # the big-budget case degenerates to one populated shard
    one = read_sharded_lines(spark, three_files, map_kilobytes=64)
    assert one.select("shard_id").distinct().count() == 1


def test_missing_final_newline_costs_phantom_byte(tmp_path):
    p = tmp_path / "nofinal.txt"
    p.write_bytes(b"abc\ndef")  # 'def' unterminated
    shards = shard_files([str(p)], map_kilobytes=1)
    # one open shard holding the whole file, end = 4 + (3+1) = 8,
    # one byte past EOF (getline's size+1 accounting)
    pieces = [pc for s in shards for pc in s]
    assert pieces == [(str(p), 0, 8)]


def test_word_count_via_sharded_source_matches_plain_read(spark, three_files):
    """End-to-end: the generic engine over the spanning-shard source
    equals a token count over a plain text read — sharding must be
    invisible in results."""
    from collections import Counter

    from pyspark.sql import functions as F

    df = read_sharded_lines(spark, three_files, map_kilobytes=1)
    got = {
        (r["w"], r["n"])
        for r in df.select(F.explode(F.split("line", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = Counter()
    for p in three_files:
        for line in open(p).read().splitlines():
            want.update(line.split(" "))
    assert got == set(want.items())
