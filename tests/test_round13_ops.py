"""Round-13 additions: Hadoop-FS input sizing (VERDICT r12 #6) and the
ann_ivf_adc composition's unit seams (its oracle/recall/plan gates live
in test_oracle_parity / test_ann_recall / test_plans)."""

from __future__ import annotations

import os

from mapreduceinfrastructure_spark.operators.dedup import (
    PREFIX_WIDTH_CAP,
    _input_bytes,
    _prefix_width,
)


def test_input_bytes_hadoop_uri(spark, sf_dir):
    """VERDICT r12 #6: an os.stat-opaque URI (object store, file:
    scheme) must size byte-accurately through the Hadoop FileSystem
    the scan itself uses, not collapse to the 0 -> cluster-width
    fallback.  file:// is the in-container stand-in for s3:// — same
    code path (scheme resolution via Path.getFileSystem), no mocking."""
    local = _input_bytes(sf_dir, "documents")
    assert local > 0
    uri_dir = "file://" + sf_dir
    # os.stat route alone cannot see it ...
    assert not os.path.isfile(os.path.join(uri_dir, "documents.parquet"))
    assert _input_bytes(uri_dir, "documents") == 0
    # ... the Hadoop route is byte-accurate
    assert _input_bytes(uri_dir, "documents", spark) == local


def test_prefix_width_hadoop_uri_matches_local(spark, sf_dir):
    """_prefix_width on the URI form must equal the local byte-derived
    width (not the 4x defaultParallelism fallback), because the stat
    now resolves through Hadoop."""
    assert _prefix_width("file://" + sf_dir, spark) == _prefix_width(
        sf_dir, spark
    )


def test_input_bytes_unresolvable_still_zero(spark):
    """The documented fallback contract is unchanged: a path neither
    os.stat nor Hadoop can resolve returns 0 (callers then size from
    the cluster), and a sessionless call on a missing local path
    returns 0 without touching any JVM."""
    assert _input_bytes("/no/such/place", "documents") == 0
    assert _input_bytes("/no/such/place", "documents", spark) == 0
    w = _prefix_width("/no/such/place", spark)
    assert w == min(
        PREFIX_WIDTH_CAP, max(8, 4 * spark.sparkContext.defaultParallelism)
    )


def test_pq_codebook_transports_agree_bitwise(spark, sf_dir, monkeypatch):
    """VERDICT r12 #5: the two codebook transports — plan literal
    (test geometry) and broadcast 1-row frame (production geometry,
    past PQ_CODEBOOK_LITERAL_MAX_BYTES) — must agree bit-for-bit.
    Forcing the threshold to 0 routes the SAME test-geometry queries
    through the frame path; every value (rounded-6dp doubles included)
    must be identical, proving the expression tree evaluates the same
    folds regardless of how the codebook array reaches the executor."""
    from mapreduceinfrastructure_spark.operators import similarity as sim

    def rows(name):
        import __spark_entry__ as entrymod

        return sorted(
            tuple(r) for r in entrymod.queries()[name](spark, sf_dir).collect()
        )

    lit = {n: rows(n) for n in ("pq_quantize", "pq_adc_topk", "ann_ivf_adc")}
    monkeypatch.setattr(sim, "PQ_CODEBOOK_LITERAL_MAX_BYTES", 0)
    for n, want in lit.items():
        got = rows(n)
        assert got == want, f"{n}: transports diverge"

    # and the frame path really is the broadcast-join plan
    from mapreduceinfrastructure_spark.plans.explain import formatted_plan

    import __spark_entry__ as entrymod

    plan = formatted_plan(entrymod.queries()["pq_quantize"](spark, sf_dir))
    assert "__pq_cb" in plan and "BroadcastExchange" in plan
