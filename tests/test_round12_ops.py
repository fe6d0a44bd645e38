"""Round-12 invariants: the pq_quantize sparse-seed/code-identity fix
and the ann_lsh pool-capacity guard (ADVICE r11 #1/#2)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod
from mapreduceinfrastructure_spark.operators import similarity as sim
from tests.conftest import assert_matches_oracle


def _embeddings_dir(tmp_path, vec_ids, dim=sim.EMBED_DIM, seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((len(vec_ids), dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(vec_ids, type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array([0] * len(vec_ids), type=pa.int64()),
        }
    )
    d = tmp_path / "sf_sparse"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


def _duck_for(sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


def test_pq_quantize_sparse_seed_ids_match_oracle(spark, tmp_path):
    """ADVICE r11 #1: with GAPS in vec_ids below PQ_K the Spark side
    must emit the ACTUAL seed vec_id as the code (what the DuckDB twin
    does), not the collected position — and must not index past the
    codebook literal.  Seeds here are {0, 2, 5, 11}: position-as-code
    would emit {0,1,2,3} and diverge on three of four seeds."""
    vec_ids = [0, 2, 5, 11, 40, 41, 42, 43, 44]
    d = _embeddings_dir(tmp_path, vec_ids)
    con = _duck_for(d)
    try:
        df = sim.pq_quantize(spark, d)
        codes = {r["code"] for r in df.collect()}
        assert codes <= {0, 2, 5, 11}, f"non-seed codes emitted: {codes}"
        assert_matches_oracle(df, con, entrymod.oracle_sql()["pq_quantize"])
    finally:
        con.close()


def test_pq_quantize_partial_seed_set_no_ansi_raise(spark, tmp_path):
    """ADVICE r11 #1 (second half): a corpus with FEWER than PQ_K total
    vectors used to index element_at past the flat codebook literal —
    INVALID_ARRAY_INDEX under Spark 4's ANSI default.  3 vectors must
    now encode cleanly against a 3-entry codebook and match the twin."""
    vec_ids = [1, 4, 9]  # all < PQ_K, none at 0, count < PQ_K
    d = _embeddings_dir(tmp_path, vec_ids)
    con = _duck_for(d)
    try:
        df = sim.pq_quantize(spark, d)
        rows = df.collect()
        assert len(rows) == len(vec_ids) * sim.PQ_SUB
        # each vector's own entry is at distance 0 -> codes itself
        own = {r["code"] for r in rows if r["sq_err"] == 0.0}
        assert own == set(vec_ids)
        assert_matches_oracle(df, con, entrymod.oracle_sql()["pq_quantize"])
    finally:
        con.close()


def test_prefix_width_zero_bytes_falls_back_to_cluster_width(spark, sf_dir):
    """VERDICT r11 #4: an unstatable documents path (object-store URI,
    stat failure) must size the prefix-family shuffle from the cluster
    (4x defaultParallelism), never collapse to the tiny-input floor of
    8 — that floor on a 100 TB input is a planned-in bottleneck."""
    from mapreduceinfrastructure_spark.operators.dedup import (
        PREFIX_WIDTH_CAP,
        _input_bytes,
        _prefix_width,
    )

    missing = "/no/such/place"
    assert _input_bytes(missing, "documents") == 0
    w = _prefix_width(missing, spark)
    assert w == min(
        PREFIX_WIDTH_CAP, max(8, 4 * spark.sparkContext.defaultParallelism)
    )
    assert w > 8
    # sessionless callers still get a sane non-floor fallback
    assert _prefix_width(missing) == 128
    # the statable path keeps the byte-derived sizing
    assert _prefix_width(sf_dir, spark) >= 8


def test_ann_lsh_pool_capacity_guard(spark, sf_dir, monkeypatch):
    """ADVICE r11 #2: past ORACLE_MAX_VECTORS the operator must raise
    an actionable error naming the regenerate-the-oracle fix, not
    silently switch to a wider pool the SQL twin cannot follow."""
    monkeypatch.setattr(sim, "_bits_per_table", lambda n: sim.POOL_BPT + 1)
    with pytest.raises(RuntimeError, match="regenerate the embedded oracle"):
        sim.ann_lsh(spark, sf_dir)
