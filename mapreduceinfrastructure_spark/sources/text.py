"""Newline-delimited text source — the reference's native input format.

Reference semantics: an input dataset is an ordered list of text files,
one record per '\n'-terminated line (description.md:44); shards are
newline-aligned byte ranges that may span files (src/file_shard.h:8-43).
Hadoop's LineRecordReader gives Spark exactly those semantics natively:
`spark.read.text` splits at `spark.sql.files.maxPartitionBytes`
boundaries aligned to newlines, and multiple paths concatenate in order
(UNION-ALL of files, mirroring file_shard.h:23's loop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_text_lines(
    spark: SparkSession,
    paths: str | Sequence[str],
    shard_kilobytes: int | None = None,
) -> DataFrame:
    """Read text file(s) as DataFrame[value: string], one row per line.

    ``shard_kilobytes`` mirrors the reference's ``map_kilobytes`` config
    knob (test/config.ini:6; sizing formula description.md:18) — it sets
    the max input-split size so M map partitions ≈
    ceil(total_bytes / shard_kilobytes KB).
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read
    if shard_kilobytes is not None:
        # Per-read split-size override (DataSource v1 option).
        reader = reader.option("maxPartitionBytes", str(shard_kilobytes * 1024))
    return reader.text(list(paths))
