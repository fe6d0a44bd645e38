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


def test_ivf_pq_residual_matches_python_reference(spark, sf_dir, monkeypatch):
    """ivf_pq_residual vs a pure-numpy recomputation from the parquet
    vectors: seed centroids (vec_id % 40 == 0), 2 Lloyd iterations of
    argmin/mean (ties to lower cid), final assignment, residual
    subtraction, residual seed codebook (vec_id < PQ_K), and argmin of
    the j-ascending fold per subspace (ties to lower code) — ground
    truth from first principles, no Spark or DuckDB machinery shared.
    Runs under SPARK_GRAFT_PQ_SEED=1 (r15): the production path
    trains the residual codebook (oracle-replayed), this reference
    pins the env-gated seed A/B path."""
    monkeypatch.setenv("SPARK_GRAFT_PQ_SEED", "1")
    import numpy as np
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from mapreduceinfrastructure_spark.operators.similarity import (
        LLOYD_ITERATIONS,
        N_CLUSTERS_MOD,
        PQ_K,
        PQ_SUB,
        PQ_SUBDIM,
    )

    got = {
        (r["vec_id"], r["subspace"]): (r["cid"], r["code"], r["sq_err"])
        for r in entrymod.queries()["ivf_pq_residual"](spark, sf_dir).collect()
    }

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = [int(x) for x in t["vec_id"].to_pylist()]
    vecs = {i: np.array(v, dtype=np.float64) for i, v in
            zip(ids, t["embedding"].to_pylist())}

    # Lloyd: seed cents, iterate argmin/mean, final assignment
    cents = {i: vecs[i].copy() for i in ids if i % N_CLUSTERS_MOD == 0}

    def nearest(c):
        out = {}
        for i, v in vecs.items():
            best = min(
                c.items(), key=lambda kv: (float(np.sum((v - kv[1]) ** 2)), kv[0])
            )
            out[i] = best[0]
        return out

    for _ in range(LLOYD_ITERATIONS):
        a = nearest(cents)
        newc = {}
        for cid in set(a.values()):
            members = [vecs[i] for i in a if a[i] == cid]
            newc[cid] = np.mean(members, axis=0)
        cents = newc
    assign = nearest(cents)

    res = {i: vecs[i] - cents[assign[i]] for i in ids}
    seeds = sorted(i for i in ids if i < PQ_K)
    assert seeds, "no residual seeds at this SF"

    for i in ids:
        for s in range(PQ_SUB):
            rs = res[i][s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            best = min(
                (
                    (float(np.sum((rs - res[c][s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]) ** 2)), c)
                    for c in seeds
                ),
            )
            cid_g, code_g, err_g = got[(i, s)]
            assert cid_g == assign[i], (i, s, cid_g, assign[i])
            assert code_g == best[1], (i, s, code_g, best)
            assert abs(err_g - best[0]) < 1e-6, (i, s, err_g, best)


def test_dsir_weights_favor_target_source(spark, sf_dir):
    """The semantic contract of importance weights: documents FROM the
    target slice must score higher on average than the rest of the
    corpus (they are literally drawn from the target distribution),
    and every doc must carry a finite weight (Laplace smoothing over
    the shared vocab guarantees no -inf/+inf)."""
    import math

    import __spark_entry__ as entrymod
    from mapreduceinfrastructure_spark.operators.pipeline import (
        DSIR_TARGET_SOURCE,
    )
    from mapreduceinfrastructure_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    w = entrymod.queries()["dsir_weights"](spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rows = w.join(src, "doc_id").collect()
    assert rows
    tgt = [r["log_weight"] for r in rows if r["source"] == DSIR_TARGET_SOURCE]
    rest = [r["log_weight"] for r in rows if r["source"] != DSIR_TARGET_SOURCE]
    assert tgt and rest
    for r in rows:
        assert math.isfinite(r["log_weight"]) and r["n_tokens"] > 0
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest), (
        f"target mean {sum(tgt) / len(tgt):.4f} <= "
        f"rest mean {sum(rest) / len(rest):.4f}"
    )


def test_dsir_weights_self_target_is_exactly_zero(spark, sf_dir, tmp_path_factory):
    """Bit-exactness invariant: when the target slice IS the whole
    corpus (every doc carries the target source), c_tgt == c_raw and
    n_tgt == n_raw for every vocab word, so each token's log ratio is
    ln(1) and every doc's log_weight must be EXACTLY 0.0 — no float
    tolerance.  Any smoothing asymmetry, vocab mismatch, or stray
    count would break the exact zero."""
    import os

    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.operators.pipeline import (
        DSIR_TARGET_SOURCE,
        dsir_weights,
    )
    from mapreduceinfrastructure_spark.sources.tables import load_table

    out = str(tmp_path_factory.mktemp("dsir_self"))
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "source", F.lit(DSIR_TARGET_SOURCE)
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    rows = dsir_weights(spark, out).collect()
    assert rows
    for r in rows:
        assert r["log_weight"] == 0.0, (r["doc_id"], r["log_weight"])


def test_bm25_topk_invariants(spark, sf_dir):
    """Structural invariants of the BM25 ranking (the value-level gate
    is the DuckDB twin): per query at most BM25_TOPK rows with dense
    ranks from 1, strictly positive scores (the Lucene idf form is
    never negative and tf/dl are positive), no self-retrieval, and
    non-increasing scores down each ranking."""
    from mapreduceinfrastructure_spark.operators.text_analysis import (
        BM25_N_QUERIES,
        BM25_TOPK,
        bm25_topk,
    )

    rows = bm25_topk(spark, sf_dir).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["qid"] < BM25_N_QUERIES
        assert r["doc_id"] != r["qid"]
        assert r["bm25"] > 0.0
        by_q.setdefault(r["qid"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        scores = [r["bm25"] for r in rs]
        assert scores == sorted(scores, reverse=True), q


def test_lexical_semantic_rrf_invariants(spark, sf_dir):
    """The fused list must only contain docs from one or both input
    rankings (n_lists in {1, 2}), its score is bounded by the two-list
    maximum 2/(RRF_K+1), and two-list members must outrank any
    one-list member with a worse score by construction of RRF."""
    from mapreduceinfrastructure_spark.operators.similarity import RRF_K
    from mapreduceinfrastructure_spark.operators.text_analysis import (
        BM25_TOPK,
        lexical_semantic_rrf,
    )

    rows = lexical_semantic_rrf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_lists"] in (1, 2)
        assert 0.0 < r["rrf"] <= 2.0 / (RRF_K + 1) + 1e-12
        assert 1 <= r["fused_rank"] <= BM25_TOPK


def test_pca_power_iter_matches_numpy_replay(spark, sf_dir):
    """Independent reference: replay the identical recurrence (same
    mean, same 0.125 start vector, same iteration count, same
    Rayleigh/(n-1) eigenvalue) in numpy float64 and compare loadings
    and eigenvalue to 1e-4 — covers the operator end to end without
    DuckDB (the oracle twin covers cross-engine exactness; this covers
    'is it actually the power method')."""
    import numpy as np

    from mapreduceinfrastructure_spark.operators.similarity import (
        PCA_ITERS,
        PCA_START,
        pca_power_iter,
    )

    out = {r["pos"]: r for r in pca_power_iter(spark, sf_dir).collect()}
    assert len(out) == 64
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    n = x.shape[0]
    xc = x - x.mean(axis=0)
    w = np.full(64, PCA_START)
    lam = 0.0
    for _ in range(PCA_ITERS):
        y = xc.T @ (xc @ w)
        lam = float(w @ y) / (n - 1)
        w = y / np.linalg.norm(y)
    for j in range(64):
        assert abs(out[j]["loading"] - w[j]) < 1e-4, j
        assert abs(out[j]["eigenvalue"] - lam) < 1e-4
    # unit vector and positive variance along it
    assert abs(sum(v["loading"] ** 2 for v in out.values()) - 1.0) < 1e-4
    assert lam > 0


def test_pca_debias_matches_numpy_replay(spark, sf_dir):
    """Numpy float64 replay of the all-but-the-top transform on the
    shared _pca_fit direction: proj, pre/post norms to 1e-4, plus the
    Pythagorean invariant norm_after^2 + proj^2 ~ norm_before^2 (the
    residual is orthogonal to w by construction)."""
    import numpy as np

    from mapreduceinfrastructure_spark.operators.similarity import (
        PCA_ITERS,
        PCA_START,
        pca_debias,
    )

    out = {r["vec_id"]: r for r in pca_debias(spark, sf_dir).collect()}
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    ids = [r["vec_id"] for r in emb]
    x = np.array([list(r["embedding"]) for r in emb], dtype=np.float64)
    assert len(out) == len(ids)
    xc = x - x.mean(axis=0)
    w = np.full(64, PCA_START)
    for _ in range(PCA_ITERS):
        y = xc.T @ (xc @ w)
        w = y / np.linalg.norm(y)
    proj = xc @ w
    nb = np.linalg.norm(xc, axis=1)
    na = np.linalg.norm(xc - np.outer(proj, w), axis=1)
    for k, vid in enumerate(ids):
        r = out[vid]
        assert abs(r["proj"] - proj[k]) < 1e-4, vid
        assert abs(r["norm_before"] - nb[k]) < 1e-4, vid
        assert abs(r["norm_after"] - na[k]) < 1e-4, vid
        assert abs(
            r["norm_after"] ** 2 + r["proj"] ** 2 - r["norm_before"] ** 2
        ) < 1e-3, vid


def test_cluster_balanced_sample_invariants(spark, sf_dir):
    """Quota and determinism invariants (values gate via the DuckDB
    twin): per cluster at most CLUSTER_SAMPLE_QUOTA rows with dense
    md5-ordered ranks, never more sampled than members, and a second
    run returns the identical set (no RNG anywhere)."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        CLUSTER_SAMPLE_QUOTA,
        cluster_balanced_sample,
    )

    rows = cluster_balanced_sample(spark, sf_dir).collect()
    assert rows
    by_c: dict[int, list] = {}
    for r in rows:
        by_c.setdefault(r["cid"], []).append(r)
    for cid, rs in by_c.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= CLUSTER_SAMPLE_QUOTA
        assert all(r["n_members"] >= len(rs) for r in rs), cid
    again = {(r["cid"], r["vec_id"]) for r in cluster_balanced_sample(spark, sf_dir).collect()}
    assert again == {(r["cid"], r["vec_id"]) for r in rows}


def test_bm25_planted_duplicate_ranks_first(spark, tmp_path_factory):
    """Planted-corpus semantic pin: a verbatim copy of a query doc
    shares every term at identical tf, so it must outscore every
    partial-overlap doc and rank #1 for that query; a doc sharing a
    rarer subset must beat one sharing only the common subset."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.text_analysis import bm25_topk

    d = str(tmp_path_factory.mktemp("bm25_planted"))
    q = "alpha beta gamma delta epsilon"
    texts = [q]  # doc 0: the query
    texts.append(q)  # doc 1: verbatim copy
    texts.append("alpha beta gamma noise1 noise2")  # doc 2: partial
    texts.append("alpha noise3 noise4 noise5 noise6")  # doc 3: weak
    # filler docs so df ratios are meaningful; only a few carry alpha
    # (keeping it under the df cap, unlike the hot-everywhere probe)
    for i in range(4, 40):
        extra = "alpha" if i < 8 else f"filler{i}"
        texts.append(f"{extra} pad{i} pad{i} pad{i} pad{i}")
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in bm25_topk(spark, d).collect() if r["qid"] == 0}
    assert rows[1]["rn"] == 1, rows  # the verbatim copy wins
    assert rows[2]["bm25"] > rows[3]["bm25"]  # more shared rare terms

    # the impact-pruned index must keep the verbatim copy on top too:
    # its postings carry maximal per-term impact, so static pruning
    # never cuts them (the recall trade hits low-impact tails, not
    # near-duplicates — the case dedup retrieval actually needs)
    from mapreduceinfrastructure_spark.operators.text_analysis import (
        bm25_pruned_topk,
    )

    prows = {
        r["doc_id"]: r for r in bm25_pruned_topk(spark, d).collect() if r["qid"] == 0
    }
    assert prows[1]["rn"] == 1, prows
