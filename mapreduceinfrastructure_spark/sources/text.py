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

    Spark has no per-read split-size option: FilePartition.maxSplitBytes
    reads only the SESSION conf ``spark.sql.files.maxPartitionBytes``
    (a reader ``.option`` of that name is silently ignored), so the knob
    is applied as a session conf here.  File-scan partitions are planned
    at ACTION time, so the conf must stay set until the job's action
    runs; ``run_job`` restores the previous value after its write.
    """
    if isinstance(paths, str):
        paths = [paths]
    if shard_kilobytes is not None:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(shard_kilobytes * 1024)
        )
    return spark.read.text(list(paths))
