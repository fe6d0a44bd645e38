"""SQL entry point: the engine's tables as temp views + ANSI SQL text.

The reference has no SQL surface (SURVEY.md §4: no parser/planner); on
Spark it is free — ``spark.sql`` over registered views compiles to the
same Catalyst plans as the DataFrame API.  The showcase query below is
written in the ANSI-compatible intersection of Spark SQL and DuckDB and
is used VERBATIM as its own oracle: one SQL text, two engines, matching
hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
)

# ANSI-intersection SQL: CTE + agg + join + second agg, no dialect
# functions.  Shared verbatim between spark.sql() and the DuckDB oracle.
ANSI_SEGMENT_SPEND = """
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT c_mktsegment, count(*) AS n_cust,
           round(avg(total), 6) AS avg_spend,
           round(max(total), 2) AS max_spend
    FROM customer JOIN spend ON c_custkey = o_custkey
    GROUP BY c_mktsegment
"""


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the star schema as temp views for ``spark.sql`` (the
    driver's DuckDB oracle pre-registers the same names)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_segment_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-segment spend profile, via the SQL surface."""
    register_views(spark, sf_dir)
    return spark.sql(ANSI_SEGMENT_SPEND)
