"""Round-11 invariants: the ann_lsh plane-pool oracle regime (VERDICT
r10 #4) and the bpe_merges unrolled-CTE oracle (VERDICT r10 #3)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from mapreduceinfrastructure_spark.operators import similarity as sim


def test_ann_lsh_oracle_regime_boundary():
    """The embedded pool covers exactly the corpora where the adaptive
    width fits POOL_BPT: _bits_per_table(ORACLE_MAX_VECTORS) lands ON
    the pool width and one more vector exceeds it — if someone widens
    the adaptive rule or shrinks the pool, this fails before the
    oracle silently drifts out of its regime."""
    assert sim._bits_per_table(sim.ORACLE_MAX_VECTORS) == sim.POOL_BPT
    assert sim._bits_per_table(sim.ORACLE_MAX_VECTORS + 1) > sim.POOL_BPT
    # every driver SF (500 / 500 / 2000 vectors) and the beyond-floor
    # synthetic corpus sit far inside the covered regime
    for n in (500, 2000, 20_000):
        assert sim._bits_per_table(n) <= sim.POOL_BPT
    # the operator's used-plane mapping is literally the pool block
    pool = sim.lsh_plane_pool()
    for bpt in (sim.BITS_FLOOR, 6, sim.POOL_BPT):
        used = [
            pool[t * sim.POOL_BPT + k]
            for t in range(sim.N_TABLES)
            for k in range(bpt)
        ]
        assert used[0] == pool[0] and len(used) == sim.N_TABLES * bpt


def _adaptive_corpus(tmp_path, n=20_000, planted=10):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, sim.EMBED_DIM)).astype(np.float32)
    for i in range(planted):
        vecs[n // 2 + i] = vecs[i]
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
            "label": pa.array([0] * n, type=pa.int64()),
        }
    )
    d = tmp_path / "sf_adapt_oracle"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")
    return str(d)


def test_ann_lsh_oracle_exact_beyond_floor(spark, tmp_path):
    """The money test for the r11 oracle rework: at 20k vectors the
    adaptive width leaves the floor (bpt=6), which the OLD fixed-floor
    oracle could not follow — the dynamic-bpt oracle must still match
    the Spark operator row-for-row (same buckets, candidates, ranks)."""
    import __spark_entry__ as se

    d = _adaptive_corpus(tmp_path)
    assert sim._bits_per_table(20_000) == 6

    got = se.queries()["ann_lsh"](spark, d).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = con.sql(se.oracle_sql()["ann_lsh"]).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    a["cosine"] = a["cosine"].round(6)
    b["cosine"] = b["cosine"].round(6)
    assert len(a) == len(b) > 0
    assert a.astype(str).equals(b.astype(str))


def test_bpe_merges_oracle_matches_python_reference(sf_dir):
    """The generated unrolled-CTE oracle (closed-form run-parity merge)
    equals the sequential pure-Python BPE trainer on the real corpus —
    the induction step backing the bpe_merges driver oracle.  Spark ==
    reference is test_bpe.py; this closes reference == oracle, so all
    three agree."""
    import __spark_entry__ as se
    from tests.test_bpe import _reference_bpe

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    got = [
        tuple(r)
        for r in con.sql(
            se.oracle_sql()["bpe_merges"] + " ORDER BY rank"
        ).fetchall()
    ]
    texts = [r[0] for r in con.sql("SELECT text FROM documents").fetchall()]
    from mapreduceinfrastructure_spark.operators.text_analysis import (
        BPE_NUM_MERGES,
    )

    want = [tuple(w) for w in _reference_bpe(texts, BPE_NUM_MERGES)]
    assert got == want and len(got) == BPE_NUM_MERGES


def test_parse_wav_header_generic_chunk_scan():
    """The executor-side RIFF parse is a real chunk SCAN, not a
    fixed-offset peek: fmt/data must be recovered with extra chunks
    in front, odd-size padding honored, and non-RIFF payloads
    rejected."""
    from mapreduceinfrastructure_spark.operators.multimodal import (
        parse_wav_header,
    )

    def le(v, n):
        return int(v).to_bytes(n, "little")

    fmt = b"fmt " + le(16, 4) + le(1, 2) + le(2, 2) + le(16000, 4) + le(
        64000, 4
    ) + le(4, 2) + le(16, 2)
    data = b"data" + le(12, 4) + b"x" * 12
    # canonical layout
    canon = b"RIFF" + le(36 + 12, 4) + b"WAVE" + fmt + data
    assert parse_wav_header(canon) == (2, 16000, 16, 12, 44)
    # an odd-sized LIST chunk BEFORE fmt (scan must skip it, including
    # the RIFF pad byte) and junk after data
    lst = b"LIST" + le(5, 4) + b"INFOx" + b"\x00"
    shuffled = b"RIFF" + le(100, 4) + b"WAVE" + lst + fmt + data + b"junk"
    # data body lands after the 12-byte RIFF/WAVE preamble, the
    # 6-byte-padded LIST chunk (8+5+1) and the 24-byte fmt chunk
    assert parse_wav_header(shuffled) == (2, 16000, 16, 12, 12 + 14 + 24 + 8)
    # truncated data chunk: reported size clamped to available bytes
    trunc = (b"RIFF" + le(100, 4) + b"WAVE" + fmt + b"data" + le(50, 4)
             + b"only9byte")
    assert parse_wav_header(trunc) == (2, 16000, 16, 9, 44)
    # rejections
    assert parse_wav_header(b"RIFX" + canon[4:]) is None
    assert parse_wav_header(canon[:8]) is None
    assert parse_wav_header(b"RIFF" + le(4, 4) + b"AVI ") is None


def test_wav_header_stats_roundtrip(spark, sf_dir):
    """wav_header_stats recovers exactly the doc_id-derived container
    parameters make_wav_table encoded — the same independent-twin
    check synth_media_header provides for PNG/JPEG."""
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.multimodal import (
        WAV_BITS,
        wav_header_stats,
    )

    got = {
        r["doc_id"]: r.asDict() for r in wav_header_stats(spark, sf_dir).collect()
    }
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        ch = doc_id % 2 + 1
        rate = (doc_id % 3 + 1) * 8000
        nb = len((text or "").encode("utf-8"))
        r = got[doc_id]
        assert (r["n_channels"], r["sample_rate"], r["bits"]) == (ch, rate, WAV_BITS)
        assert r["data_bytes"] == nb
        assert r["n_frames"] == nb // (ch * (WAV_BITS // 8))
        assert r["duration_ms"] == round(r["n_frames"] * 1000.0 / rate, 6)


def test_pq_quantize_invariants(spark, sf_dir, monkeypatch):
    """PQ encode sanity on BOTH codebook paths (r15): the production
    Lloyd-trained encode keeps the structural invariants (one code per
    (vec, subspace), codes in [0, PQ_K), non-negative sq_err); the
    env-gated seed path additionally self-encodes every seed vector
    (distance 0 to its own codebook entry — not true after training,
    which moves centroids off the seeds toward cell means)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        PQ_K,
        PQ_SUB,
        pq_quantize,
    )

    rows = pq_quantize(spark, sf_dir).collect()
    n_vecs = len({r["vec_id"] for r in rows})
    assert len(rows) == n_vecs * PQ_SUB
    assert all(0 <= r["code"] < PQ_K and r["sq_err"] >= 0.0 for r in rows)

    monkeypatch.setenv("SPARK_GRAFT_PQ_SEED", "1")
    rows = pq_quantize(spark, sf_dir).collect()
    assert len(rows) == n_vecs * PQ_SUB
    assert all(0 <= r["code"] < PQ_K and r["sq_err"] >= 0.0 for r in rows)
    for r in rows:
        if r["vec_id"] < PQ_K:
            # seed's own entry is at distance 0; a lower code wins a
            # tie only if it is ALSO at distance 0 (duplicate seeds —
            # none in this corpus), so the code must be the vec_id
            assert r["code"] == r["vec_id"] and r["sq_err"] == 0.0
