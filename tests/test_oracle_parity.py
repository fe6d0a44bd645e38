"""Oracle parity for every queries()/oracle_sql() pair — the same check
the driver runs at sf=0.01 (row count + schema + order-insensitive
values), run exactly, not by hash, so mismatches show diffs."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_consistency():
    # every oracle key must have a query; queries without oracle are the
    # documented weaker rows-only ops
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
