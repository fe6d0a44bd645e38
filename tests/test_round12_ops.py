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
    silently switch to a wider pool the SQL twin cannot follow.
    ADVICE r12: but the raise is a verification limit, not an operator
    availability ceiling — SPARK_GRAFT_ANN_LSH_BEYOND_ORACLE=1 opts a
    production corpus back into the (correct, oracle-uncovered)
    stride-widened pool with a loud warning."""
    monkeypatch.setattr(sim, "_bits_per_table", lambda n: sim.POOL_BPT + 1)
    monkeypatch.delenv("SPARK_GRAFT_ANN_LSH_BEYOND_ORACLE", raising=False)
    with pytest.raises(RuntimeError, match="regenerate the embedded oracle"):
        sim.ann_lsh(spark, sf_dir)

    monkeypatch.setenv("SPARK_GRAFT_ANN_LSH_BEYOND_ORACLE", "1")
    with pytest.warns(UserWarning, match="beyond the pinned oracle"):
        df = sim.ann_lsh(spark, sf_dir)
    # widened-pool run still produces the contract shape: top-k per
    # query, rn dense from 1, self excluded
    rows = df.collect()
    assert rows, "widened-pool ann_lsh returned nothing"
    per_q = {}
    for r in rows:
        assert r["qid"] != r["neighbor_id"]
        per_q.setdefault(r["qid"], []).append(r["rn"])
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_pq_adc_topk_matches_python_reference(spark, sf_dir, monkeypatch):
    """pq_adc_topk vs a pure-Python recomputation from the parquet
    vectors: codes by argmin of the same j-ascending fold, ADC as the
    fixed s-order sum of subspace distances to the coded entries —
    ground-truth parameters, no Spark or DuckDB machinery shared.
    Runs under SPARK_GRAFT_PQ_SEED=1 (r15): the production path
    encodes with the Lloyd-TRAINED codebook (verified end-to-end by
    the oracle's unrolled training replay), while this pure-Python
    reference pins the env-gated seed A/B path whose codebook is
    derivable from first principles without replaying Lloyd."""
    monkeypatch.setenv("SPARK_GRAFT_PQ_SEED", "1")
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_SUB,
        PQ_SUBDIM,
        TOPK,
        pq_adc_topk,
    )

    got = {
        (r["qid"], r["rn"]): (r["neighbor_id"], r["adc_d2"])
        for r in pq_adc_topk(spark, sf_dir).collect()
    }

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist())
    }
    seeds = sorted(i for i in vecs if i < PQ_K)

    def d2(v, pos, s):
        cb = vecs[seeds[pos]]
        acc = 0.0
        for j in range(PQ_SUBDIM):
            diff = v[s * PQ_SUBDIM + j] - cb[s * PQ_SUBDIM + j]
            acc = acc + diff * diff
        return acc

    codes = {
        i: [
            min(range(len(seeds)), key=lambda p: (d2(v, p, s), p))
            for s in range(PQ_SUB)
        ]
        for i, v in vecs.items()
    }

    want = {}
    for qid in (i for i in vecs if i < N_QUERIES):
        scored = []
        for nid, cs in codes.items():
            if nid == qid:
                continue
            adc = 0.0
            for s in range(PQ_SUB):
                adc = adc + d2(vecs[qid], cs[s], s)
            scored.append((adc, nid))
        scored.sort()
        for rn, (adc, nid) in enumerate(scored[:TOPK], start=1):
            want[(qid, rn)] = (nid, round(adc, 6))

    assert got == want
    assert len(got) == N_QUERIES * TOPK
