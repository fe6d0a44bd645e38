"""Round-10 operator invariants: degree_assortativity, cusum_drift,
media_type_profile, rrf_fusion, readability.  Oracle parity for all
five runs in test_oracle_parity.py; these pin the algebraic claims the
oracles can't see (bounds, reconstructions from raw data)."""

from __future__ import annotations

import pyarrow.parquet as pq


def test_assortativity_bounds_and_edge_count(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.graph import (
        copurchase_edges,
        degree_assortativity,
    )

    row = degree_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_edges"] == copurchase_edges(spark, sf_dir).count()
    assert row["n_nodes"] >= 2


def test_cusum_drift_matches_pandas(spark, sf_dir):
    """Integer CUSUM recomputed driver-side from the raw events — the
    full argmax trajectory, not just bounds."""
    from mapreduceinfrastructure_spark.operators.timeseries import cusum_drift
    from mapreduceinfrastructure_spark.sources.tables import (
        event_ts_us,
        load_table,
    )

    got = {r["event_type"]: r for r in cusum_drift(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select("event_type", event_ts_us(ev).alias("us")).collect()
    by_type: dict[str, dict[int, int]] = {}
    for r in raw:
        h = r["us"] // 3_600_000_000
        by_type.setdefault(r["event_type"], {}).setdefault(h, 0)
        by_type[r["event_type"]][h] += 1
    assert set(got) == set(by_type)
    for et, counts in by_type.items():
        hours = sorted(counts)
        total, t = sum(counts.values()), len(hours)
        best = None
        pref = 0
        for i, h in enumerate(hours, start=1):
            pref += counts[h]
            d = abs(t * pref - i * total)
            if best is None or d > best[0]:
                best = (d, h)
        assert (got[et]["max_drift"], got[et]["peak_hour"]) == best, et
        assert got[et]["t_hours"] == t and got[et]["n_events"] == total


def test_media_type_profile_partitions_corpus(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.multimodal import (
        media_type_profile,
    )
    from mapreduceinfrastructure_spark.sources.tables import load_table

    rows = {r["fmt"]: r for r in media_type_profile(spark, sf_dir).collect()}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert set(rows) == {"png", "jpeg", "raw"}
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    # PNG dims are doc_id-derived and RGBA: px_volume is reconstructible
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    png_px = sum(
        (d % 640 + 16) * (d % 480 + 16) * 4
        for d in tbl.column("doc_id").to_pylist()
        if d % 3 == 0
    )
    assert rows["png"]["px_volume"] == png_px


def test_rrf_fusion_scores_and_shape(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators.similarity import (
        RRF_K,
        TOPK,
        rrf_fusion,
    )

    rows = rrf_fusion(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        ranks = sorted(r["fused_rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= TOPK
        for r in rs:
            assert r["n_lists"] in (1, 2)
            # max possible score: rank 1 in both lists
            assert r["rrf"] <= round(2.0 / (RRF_K + 1), 6) + 1e-9
    # at least one neighbor is found by both rankers somewhere
    assert any(r["n_lists"] == 2 for r in rows)


def test_readability_matches_python(spark, sf_dir):
    """Python recomputation of the Flesch proxy from the raw text —
    same splits (strtok-faithful tokenizer, [.!?] sentences), same
    division/literal tree, for every doc."""
    import re

    from mapreduceinfrastructure_spark.operators.text_analysis import (
        readability,
    )

    got = {r["doc_id"]: r for r in readability(spark, sf_dir).collect()}
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        text = text or ""
        n_s = len([s for s in re.split(r"[.!?]", text) if s.strip()])
        toks = [t for t in re.split(r"[ ,.\"']", text) if t]
        n_w, n_c = len(toks), sum(len(t) for t in toks)
        r = got[doc_id]
        assert (r["n_sentences"], r["n_words"], r["n_chars"]) == (n_s, n_w, n_c)
        if n_s > 0 and n_w > 0:
            want = round(206.835 - 1.015 * (n_w / n_s) - 84.6 * ((n_c / n_w) / 3.0), 4)
        else:
            want = 0.0
        assert r["reading_ease"] == want, doc_id


def test_linreg_moments_exact_past_bigint_wrap(spark):
    """The DECIMAL(38,0) regression moments stay exact where the former
    BIGINT sums failed: 2000 rows of yc ~ 3e9 give syy ~ 1.8e19 > 2^63.
    Under this session's ANSI default (Spark 4) the BIGINT sum raises
    ARITHMETIC_OVERFLOW — the query would simply die past sf~2; a
    non-ANSI deployment would wrap silently instead.  Either way the
    DECIMAL moments return the exact Python-int ground truth."""
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException
    from pyspark.sql import functions as F

    n, yc = 2000, 3_000_000_000
    truth = n * yc * yc
    assert truth > 2**63  # the regime this test exists for

    df = spark.range(n).select(F.lit(yc).cast("long").alias("yc"))
    with pytest.raises(ArithmeticException):  # the former BIGINT moment
        df.agg(F.sum(F.col("yc") * F.col("yc")).alias("s")).collect()
    exact = df.agg(
        F.sum(F.col("yc").cast("decimal(38,0)") * F.col("yc")).alias("s")
    ).collect()[0]["s"]
    assert int(exact) == truth  # DECIMAL(38,0) is exact there
