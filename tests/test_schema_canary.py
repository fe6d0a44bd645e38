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


def test_event_ts_us_layouts_equivalent(spark, tmp_path):
    """The round-2 regression, pinned forever: the same logical events
    written as timestamp[us] and as int64 nanoseconds must produce
    IDENTICAL session math through event_ts_us — if the driver's
    generator flips layout again, this fails locally in seconds."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.sources.tables import event_ts_us

    us = [1_700_000_000_000_000 + i * 61_000_000 for i in range(50)]
    cols = {
        "event_id": list(range(50)),
        "user_id": [i % 5 for i in range(50)],
        "event_type": ["a"] * 50,
        "value": [float(i) for i in range(50)],
        "props": ["{}"] * 50,
    }
    t_us = pa.table({**cols, "ts": pa.array(us, type=pa.timestamp("us"))})
    t_ns = pa.table({**cols, "ts": pa.array([u * 1000 for u in us], type=pa.int64())})
    d_us, d_ns = tmp_path / "us", tmp_path / "ns"
    d_us.mkdir(); d_ns.mkdir()
    pq.write_table(t_us, d_us / "events.parquet")
    pq.write_table(t_ns, d_ns / "events.parquet")

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = []
    for d in (d_us, d_ns):
        df = spark.read.parquet(str(d / "events.parquet"))
        got = (
            df.select("event_id", event_ts_us(df).alias("ts_us"))
            .orderBy("event_id")
            .collect()
        )
        out.append([(r["event_id"], r["ts_us"]) for r in got])
    assert out[0] == out[1]
    assert out[0][0][1] == us[0]
