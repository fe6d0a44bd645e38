"""Schema-drift canary: assert the dtypes every operator assumes.

The driver regenerates /root/testdata per round, and the physical
layout has already changed once (events.ts: TIMESTAMP(NANOS)-as-long in
round 1 -> timestamp[us] in round 2), silently breaking six queries,
streaming, and the bench.  This test reads only parquet footers (no
scan) at sf0.001 and fails in seconds if any assumed column type
drifts, naming the table and column.
"""

from __future__ import annotations

import os

import pytest

from mapreduceinfrastructure_spark.sources.tables import (
    TABLE_NAMES,
    event_ts_us,
    load_table,
)

CANARY_SF_DIR = os.environ.get("SPARK_GRAFT_CANARY_SF_DIR", "/root/testdata/sf0.001")

# column -> set of dtypes our operators can handle (see event_ts_us for
# why ts admits several layouts).
EXPECTED = {
    "region": {"r_regionkey": {"bigint", "int"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"bigint", "int"},
        "n_name": {"string"},
        "n_regionkey": {"bigint", "int"},
    },
    "customer": {
        "c_custkey": {"bigint", "int"},
        "c_nationkey": {"bigint", "int"},
        "c_mktsegment": {"string"},
        "c_acctbal": {"double", "decimal(15,2)"},
    },
    "supplier": {
        "s_suppkey": {"bigint", "int"},
        "s_nationkey": {"bigint", "int"},
    },
    "part": {
        "p_partkey": {"bigint", "int"},
        "p_brand": {"string"},
        "p_retailprice": {"double", "decimal(15,2)"},
    },
    "orders": {
        "o_orderkey": {"bigint", "int"},
        "o_custkey": {"bigint", "int"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double", "decimal(15,2)"},
        "o_orderdate": {"date", "timestamp", "timestamp_ntz"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint", "int"},
        "l_partkey": {"bigint", "int"},
        "l_suppkey": {"bigint", "int"},
        "l_quantity": {"double", "bigint", "int", "decimal(15,2)"},
        "l_extendedprice": {"double", "decimal(15,2)"},
        "l_discount": {"double", "decimal(15,2)"},
        "l_tax": {"double", "decimal(15,2)"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"date", "timestamp", "timestamp_ntz"},
    },
    "events": {
        "event_id": {"bigint", "int"},
        # every layout event_ts_us can adapt to
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": {"bigint", "int"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint", "int"},
        "source": {"string"},
        "lang": {"string"},
        "text": {"string"},
        "n_chars": {"bigint", "int"},
    },
    "embeddings": {
        "vec_id": {"bigint", "int"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"bigint", "int"},
    },
}


ALL_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
@pytest.mark.parametrize("table", TABLE_NAMES)
def test_table_schema_matches_operator_assumptions(spark, table, sf):
    df = load_table(spark, sf, table)
    dtypes = dict(df.dtypes)
    for col, allowed in EXPECTED.get(table, {}).items():
        assert col in dtypes, f"{sf}/{table}.{col} missing; has {sorted(dtypes)}"
        assert dtypes[col] in allowed, (
            f"{sf}/{table}.{col} drifted to {dtypes[col]!r}; operators "
            f"assume one of {sorted(allowed)} — audit every use site "
            f"before widening this set (see round-2 ts regression)"
        )


def test_event_ts_us_resolves_on_current_layout(spark):
    """event_ts_us must produce a BIGINT epoch-us on whatever layout the
    current testdata carries (analysis-time check, no job run)."""
    ev = load_table(spark, CANARY_SF_DIR, "events")
    out = ev.select(event_ts_us(ev).alias("ts_us"))
    assert dict(out.dtypes)["ts_us"] == "bigint"
    row = out.limit(1).collect()
    # epoch-us magnitude sanity: year 2000..2100
    if row:
        assert 946_684_800_000_000 < row[0]["ts_us"] < 4_102_444_800_000_000
