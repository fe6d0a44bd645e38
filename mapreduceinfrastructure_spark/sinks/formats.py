"""Format breadth: CSV / JSON / ORC / partitioned + bucketed parquet sinks and
their round-trip readers.

The reference's only format is ``key value\\n`` text (description.md:
66-68); a real pipeline needs columnar + interchange formats.  These
helpers standardize the engine's write options so every sink is
re-readable with a stable schema.

Scale notes: partitioned parquet (partitionBy) gives partition pruning
on read; bucketBy co-locates join keys so repeated joins on the bucket
column skip their shuffle (the reference's hash(key)%R made persistent).
Delta/Iceberg need jars not present in this environment — connectors
would follow the same writer API (documented stub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # explicit schema: inferSchema double-scans and guesses types
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Hive-style partition layout → partition pruning on read."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed managed table: joins/aggs on ``bucket_col`` between
    bucketed tables skip the shuffle entirely."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_mb`` each — the standard maintenance pass for any
    long-lived 100 TB table (streaming sinks and fine-grained partition
    writes both accumulate small files, and scan-task count tracks file
    count).  Sizing is data-driven: total bytes are read from the
    source files' footers, not guessed.  Returns the file count.
    """
    import math

    df = spark.read.parquet(path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)  # noqa: SLF001
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    total = fs.getContentSummary(jvm_path).getLength()
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (built into Spark's JVM — no extra package): the other
    columnar interchange format a Hadoop-adjacent consumer asks for.
    Same pushdown/pruning behavior class as parquet on read."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
