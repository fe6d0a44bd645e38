"""Round-14 pins.

lit_double_array (functions/vector.py): the one-parse array<double>
literal that replaced list-form F.lit at every bounded vector-literal
site (SCALE.md "r14 pq_adc_topk +16% resolved").  The contract is
BIT-EXACTNESS — banked oracle rows for 16 operators ride on these
literals being identical to what F.lit produced.
"""
import math
import struct

import pytest
from pyspark.sql import functions as F

from mapreduceinfrastructure_spark.functions.vector import lit_double_array


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


# Adversarial doubles: shortest-repr edge cases, subnormals, extremes,
# negative zero, values whose decimal expansion is long.
HARD_VALUES = [
    0.1,
    -0.1,
    1.0 / 3.0,
    2.2250738585072014e-308,  # smallest normal
    5e-324,  # smallest subnormal
    1.7976931348623157e308,  # largest finite
    -1.7976931348623157e308,
    0.0,
    -0.0,
    1e16 + 2,  # integer-valued double past 2^53 granularity
    123456789.123456789,
    -3.141592653589793,
    6.02214076e23,
    1.1125369292536007e-308,  # subnormal-boundary neighborhood
]


def test_lit_double_array_bit_exact_vs_f_lit(spark):
    """Every element round-trips to the IDENTICAL IEEE-754 bits that
    list-form F.lit produces — collected side by side in one row."""
    row = (
        spark.range(1)
        .select(
            lit_double_array(HARD_VALUES).alias("fast"),
            F.lit([float(x) for x in HARD_VALUES]).alias("slow"),
        )
        .collect()[0]
    )
    fast_bits = [_bits(x) for x in row["fast"]]
    slow_bits = [_bits(x) for x in row["slow"]]
    py_bits = [_bits(float(x)) for x in HARD_VALUES]
    assert fast_bits == py_bits
    assert slow_bits == py_bits


def test_lit_double_array_negative_zero_sign_preserved(spark):
    row = spark.range(1).select(lit_double_array([-0.0]).alias("a")).collect()[0]
    assert math.copysign(1.0, row["a"][0]) == -1.0


def test_lit_double_array_nonfinite_falls_back(spark):
    """inf/nan have no SQL double literal — the helper must fall back
    to F.lit rather than emit an unparseable expression."""
    vals = [1.0, float("inf"), float("-inf"), float("nan")]
    row = spark.range(1).select(lit_double_array(vals).alias("a")).collect()[0]
    got = row["a"]
    assert got[0] == 1.0
    assert math.isinf(got[1]) and got[1] > 0
    assert math.isinf(got[2]) and got[2] < 0
    assert math.isnan(got[3])


def test_lit_double_array_accepts_generators_and_ints(spark):
    row = (
        spark.range(1)
        .select(lit_double_array(x for x in range(5)).alias("a"))
        .collect()[0]
    )
    assert list(row["a"]) == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_lit_double_array_is_fast(spark):
    """The point of the helper: ONE parse, not one gateway call per
    element.  Asserted RELATIVELY against per-element F.lit on the
    same machine in the same breath (ADVICE r14: an absolute
    wall-clock bound flakes on a loaded host even when the code is
    right): building 1024 elements through the helper must beat
    building just 32 through the list-comprehension-of-F.lit form —
    a 32x-per-element margin that host band cannot close (measured
    ~215x per element, SCALE.md "r14 literal tax")."""
    import time

    from pyspark.sql import functions as F

    vals = [0.001 * i for i in range(1024)]
    lit_double_array(vals)  # warm the parser path
    F.array(*[F.lit(float(v)) for v in vals[:2]])  # warm py4j path
    t0 = time.monotonic()
    lit_double_array(vals)
    helper = time.monotonic() - t0
    t0 = time.monotonic()
    F.array(*[F.lit(float(v)) for v in vals[:32]])
    per_element_32 = time.monotonic() - t0
    assert helper < per_element_32, (
        f"helper {helper:.4f}s vs 32-element F.lit {per_element_32:.4f}s"
    )


# --- PQ codebook training (VERDICT r13 #4) ---------------------------


@pytest.fixture(scope="module")
def pq_train_out(spark, sf_dir):
    from mapreduceinfrastructure_spark.operators import similarity as sim

    return sim.pq_train_codebooks(spark, sf_dir).toPandas()


def test_pq_train_lloyd_monotone_per_subspace(pq_train_out):
    """Lloyd is monotone non-increasing in total quantization error:
    every assignment step and every re-centering step can only lower
    sum(d2), so after PQ_TRAIN_ITERS steps each subspace's trained
    total must be <= its seed total (strictly lower on any corpus the
    seed codebook doesn't already quantize optimally)."""
    per = pq_train_out.groupby(["variant", "subspace"])["sq_err"].sum().unstack(0)
    assert (per["trained"] <= per["seed"] + 1e-6).all()
    # on the synthetic corpus the drop is substantial, not epsilon
    assert per["trained"].sum() < 0.9 * per["seed"].sum()


def test_pq_train_partitions_corpus(pq_train_out):
    """Each variant's assignment is a partition of (corpus x subspace):
    per (variant, subspace) the n_assigned sum equals the corpus size."""
    from mapreduceinfrastructure_spark.operators import similarity as sim

    per = pq_train_out.groupby(["variant", "subspace"])["n_assigned"].sum()
    sizes = set(per.tolist())
    assert len(sizes) == 1  # same corpus under every variant/subspace


def test_pq_recall_trained_not_worse(spark, sf_dir):
    """The VERDICT r13 #4 delta: mean ADC recall@TOPK under the trained
    codebook must not degrade vs the seed codebook (it improves on the
    synthetic corpus: 0.144 -> 0.172 at sf0.01, recorded in SCALE.md).
    """
    from mapreduceinfrastructure_spark.operators import similarity as sim

    r = sim.pq_recall_report(spark, sf_dir).toPandas()
    m = r.groupby("variant")["recall"].mean()
    assert m["trained"] >= m["seed"] - 1e-9


# --- BM25 recall audit (VERDICT r13 #5) -------------------------------


def test_bm25_recall_report_zipf_nondegenerate(spark, tmp_path_factory):
    """The CAP <-> recall trade at a NON-degenerate operating point:
    on a Zipf-shaped corpus (term r in every r-th doc, so hot terms
    blow past BM25_POSTINGS_CAP while the discriminating rare terms
    keep full postings) static pruning cuts only low-impact tail
    postings and recall stays high — measured 0.905 pruned / 0.916
    rrf at 400 docs.  This brackets the documented worst case on the
    synthetic ~31-word sf corpus (every term hot: pruned recall 0.03
    at sf0.01), the same way nprobe brackets IVF."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mapreduceinfrastructure_spark.operators.text_analysis import (
        bm25_recall_report,
    )

    d = str(tmp_path_factory.mktemp("bm25_zipf"))
    n = 400
    texts = []
    for i in range(n):
        words = []
        for r in range(1, 51):
            if i % r == 0:
                words.extend([f"t{r}"] * (1 + (i + r) % 3))
        words.append(f"u{i}")  # df=1 discriminator per doc
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "doc_id": list(range(n)),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))

    pdf = bm25_recall_report(spark, d).toPandas()
    mean = pdf.groupby("index")["recall"].mean()
    assert mean["pruned"] >= 0.8, mean
    assert mean["rrf"] >= 0.8, mean
    # every query has an exact ranking to audit against
    assert (pdf["n_exact"] > 0).all()


# --- streaming_index_ingest run-length tf (VERDICT r13 #6) ------------


def test_runlength_tf_equals_filter_scan(spark):
    """The r14 linearized (word, tf) shape must emit the IDENTICAL
    multiset as the r13 per-distinct filter-scan on adversarial token
    arrays: empty, singleton, all-equal, unicode, interleaved runs."""
    from scratch.tf_runlength_ab import new_pairs, old_pairs

    from pyspark.sql import functions as F

    arrays = [
        [],
        ["x"],
        ["x", "x", "x"],
        ["b", "a", "b", "a", "b"],
        ["é", "e", "é", "z"],
        [f"w{i % 7}" for i in range(50)],
    ]
    df = spark.createDataFrame([(a,) for a in arrays], "t array<string>")
    old = sorted(map(tuple, old_pairs(df).collect()))
    new = sorted(map(tuple, new_pairs(df).collect()))
    assert old == new
    # spot-check one known tf
    got = dict(
        (r["word"], r["tf"])
        for r in new_pairs(
            spark.createDataFrame([(["b", "a", "b"],)], "t array<string>")
        ).collect()
    )
    assert got == {"a": 1, "b": 2}


# --- SQ8 scalar quantization (r14) ------------------------------------


def test_sq8_quantize_invariants(spark, sf_dir):
    """Codes are 8-bit levels and reconstruction error is bounded by
    half a quantization step per dimension (floor(ratio*255 + 0.5)
    rounds to the nearest level): |err| <= (mx - mn) / 255 / 2 + eps."""
    from mapreduceinfrastructure_spark.operators.similarity import (
        SQ_LEVELS,
        _embeddings,
        _sq_params,
        sq8_quantize,
    )

    pdf = sq8_quantize(spark, sf_dir).toPandas()
    assert pdf["code"].between(0, SQ_LEVELS).all()
    mn, mx = _sq_params(_embeddings(spark, sf_dir))
    steps = {p: (mx[p] - mn[p]) / SQ_LEVELS for p in range(len(mn))}
    # +1e-6: recon_err is round(…, 6), which can land up to 5e-7 above
    bound = pdf["pos"].map(lambda p: steps[p] / 2 + 1e-6)
    assert (pdf["recon_err"] <= bound).all()


def test_sq8_topk_beats_random_and_tracks_exact(spark, sf_dir):
    """SQ8's 8-bit uniform grid is a fine quantizer at EMBED_DIM=64:
    its asymmetric top-5 should recover most of the exact L2 top-5
    (strictly better than PQ's 4x4-bit budget on the same corpus)."""
    from pyspark.sql import functions as F

    from mapreduceinfrastructure_spark.operators.similarity import (
        TOPK,
        _embeddings,
        sq8_topk,
    )
    from pyspark.sql import Window

    emb = _embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("neighbor_id"))
    exact = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOPK)
        .select("qid", "neighbor_id")
    )
    got = sq8_topk(spark, sf_dir).select("qid", "neighbor_id")
    hits = got.join(exact, ["qid", "neighbor_id"]).count()
    total = exact.count()
    assert total > 0
    recall = hits / total
    assert recall >= 0.9, recall
