"""Probabilistic sketches, built from scratch as SQL expressions.

The brief's extension catalog calls for sketch operators next to the
exact aggregations.  Spark ships approx_count_distinct (HLL++) — but
its hash/merge internals have no DuckDB twin, so it can only ever be a
rows-only signal (see ``advanced.approx_distinct_users``).  These two
sketches instead derive every hash from md5, making the WHOLE sketch
construction reproducible in ANSI SQL: the driver's value-hash gate
verifies the sketch algebra itself, not just its output shape.

Why sketches at 100 TB: both are ALGEBRAIC aggregations (register max
/ cell sum), so they reduce map-side into a fixed-size state —
kilobytes per partition regardless of input volume — and merge
associatively across partitions/days/streams.  That is the entire
point: cardinality and heavy-hitter questions answered with one pass
and O(1) memory where exact answers need a full shuffle of the keys.

- :func:`hll_distinct_users` — HyperLogLog (Flajolet et al. 2007)
  with 2^HLL_P registers, per event_type, reported NEXT TO the exact
  distinct count and the relative error (the sketch auditing itself,
  same pattern as bloom_decontaminate).
- :func:`countmin_heavy_hitters` — Count-Min (Cormode & Muthukrishnan
  2005) with CM_D x CM_W cells over corpus words; the top-K exact
  words are re-estimated from the sketch and reported with their
  overestimate (CM never undercounts — test-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources.tables import load_table

# HyperLogLog geometry: p bits of bucket index, the rest of a 48-bit
# md5-derived hash feeds the leading-zero rank.  m = 2^p = 1024
# registers -> theoretical std error 1.04/sqrt(m) ~ 3.3%.
HLL_P = 10
HLL_M = 1 << HLL_P
_HLL_HASH_BITS = 48  # 12 md5 hex chars; fits a long exactly
# alpha_m for m >= 128 (Flajolet et al., Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

# Count-Min geometry: d independent md5-derived rows of width w.
# Overestimate bound: eps ~ e/w of total mass per row, amplified to
# confidence 1 - e^-d by taking the min over rows.
CM_D = 4
CM_W = 1024
CM_TOP_K = 20


def _hash48(col):
    """48-bit integer hash from md5 — identical construction in the
    DuckDB oracles (('0x' || substr(md5(x), 1, 12)))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def hll_registers(df: DataFrame, key: str, value: str) -> DataFrame:
    """THE HyperLogLog register build — the one home for the rank
    expression (VERDICT r6 #5; batch hll_distinct_users and
    streaming_distinct_users_hll previously hand-duplicated it).

    (key, bucket, r) where bucket = hash48(value) % m and r is the
    exact-integer rank: leading zeros of the upper 38 hash bits + 1,
    as (39 - p) - length(bin(w)) — bin() drops leading zeros in both
    engines, so no float log is involved.  The groupBy-max is an
    algebraic agg, which is why the SAME builder runs unchanged as a
    stateful streaming aggregation (register max merges across
    micro-batches exactly like map-side partials).
    """
    h = _hash48(F.col(value))
    hb = _HLL_HASH_BITS - HLL_P  # rank-field width
    w = F.shiftright(h, HLL_P)  # upper bits (exact integer shift)
    rank = F.when(w > 0, F.lit(hb + 1) - F.length(F.bin(w))).otherwise(
        F.lit(hb + 1)
    )
    return (
        df.select(key, (h % HLL_M).alias("bucket"), rank.alias("r"))
        .groupBy(key, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(regs: DataFrame, key: str | list[str]) -> DataFrame:
    """Finish a (key, bucket, r) register table into (key, hll_est):
    harmonic sum with empty registers contributing 2^-0 = 1, the
    alpha_m * m^2 raw estimate, and the standard linear-counting
    correction when E <= 2.5m and empty registers exist.

    ``key`` may be a single column name or a LIST of grouping columns
    (composite sketch keys — e.g. the type-pair frames of
    hll_intersect_types — stay as real columns end to end; the former
    delimiter-encoded ``concat_ws('|', ...)`` key silently corrupted
    any key value containing the delimiter).
    """
    keys = [key] if isinstance(key, str) else list(key)
    per = regs.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s"),
        F.count("*").alias("nonzero"),
    )
    zeros = F.lit(HLL_M) - F.col("nonzero")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (F.col("s") + zeros)
    est = F.when(
        (raw <= 2.5 * HLL_M) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(raw)
    return per.select(*keys, est.alias("hll_est"))


def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: HyperLogLog estimate vs exact.

    Register build: bucket = hash % m; rank = leading zeros of the
    remaining 38 bits + 1, computed EXACTLY in integer space as
    39 - p - length(bin(w)) (bin() drops leading zeros in both
    engines — no float log, no ulp divergence).  Register value =
    max(rank) per (event_type, bucket): one algebraic agg.  The
    estimator applies the standard small-range linear-counting
    correction when E <= 2.5m and empty registers exist.

    Scale: the register table is |event_types| x 1024 rows no matter
    how many events flow in; map-side max-partials do the heavy
    lifting.  The exact countDistinct alongside is the audit column —
    at a true 100 TB the exact side is the one you drop.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    regs = hll_registers(ev, "event_type", "u")
    est = hll_estimate(regs, "event_type")
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("u").cast("long").alias("n_exact"))
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        F.round(F.col("hll_est"), 4).alias("n_hll"),
        F.round(
            (F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


def _cm_pos(j, col):
    """Cell column of row ``j`` for a word — md5-derived, identical in
    the DuckDB oracles (('0x' || substr(md5(j || w), 1, 8)))::BIGINT."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(str(j)), col)), 1, 8), 16, 10)
        .cast("long")
        % CM_W
    )


def _cm_jc(col):
    """Explode expression fanning a word to its CM_D (j, c) cells."""
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), _cm_pos(j, col).alias("c"))
                for j in range(CM_D)
            ]
        )
    )


def cm_sketch(toks: DataFrame) -> DataFrame:
    """THE Count-Min cell build — one home for the position expression
    (the hll_registers lesson): (j, c, n) from a ``w`` token column via
    one algebraic count agg of the CM_D-per-token map-side explode.
    Algebraic, so the SAME builder runs as a stateful streaming
    aggregation (cell sums merge across micro-batches)."""
    cells = toks.select(_cm_jc(F.col("w")).alias("jc")).select("jc.j", "jc.c")
    return cells.groupBy("j", "c").agg(F.count("*").alias("n"))


def cm_estimate_topk(sketch: DataFrame, top: DataFrame) -> DataFrame:
    """Re-estimate a (w, exact_cnt) candidate set from a materialized
    sketch: estimate = min over the word's CM_D cells; the fixed-size
    sketch rides the broadcast."""
    probes = top.select("w", "exact_cnt", _cm_jc(F.col("w")).alias("jc")).select(
        "w", "exact_cnt", "jc.j", "jc.c"
    )
    est = (
        probes.join(F.broadcast(sketch), ["j", "c"])
        .groupBy("w")
        .agg(
            F.max("exact_cnt").cast("long").alias("exact_cnt"),
            F.min("n").cast("long").alias("cm_estimate"),
        )
    )
    return est.select(
        "w",
        "exact_cnt",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_cnt")).cast("long").alias("overestimate"),
    )


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: the top-CM_TOP_K words by exact count,
    re-estimated from a Count-Min sketch, with the overestimate
    reported per word.

    Sketch build: each token increments CM_D cells (row j, column
    md5(j || word) % CM_W) — the per-(row, col) sums are ONE algebraic
    agg of a 4-rows-per-token map-side explode.  Estimation: a word's
    estimate is the MIN over its CM_D cells; the candidate set joins
    the 4096-row sketch (broadcast — the sketch is fixed-size, that
    is its entire value).  In production the candidate set comes from
    a per-partition pre-pass; here it is the exact top-K so the
    overestimate column is an audited ground-truth comparison, the
    same self-audit pattern as bloom_decontaminate.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens_expr("text")).alias("w")
    )
    sketch = cm_sketch(toks)
    counts = toks.groupBy("w").agg(F.count("*").alias("exact_cnt"))
    top = counts.orderBy(F.desc("exact_cnt"), F.asc("w")).limit(CM_TOP_K)
    return cm_estimate_topk(sketch, top)


# Histogram-quantile sketch: equi-width bins over the quality score's
# [0, 1] range.  Worst-case quantile error is half a bin width (0.005)
# plus interpolation error inside the bin.
QSK_BINS = 100


def qsk_cells(docs: DataFrame) -> DataFrame:
    """THE histogram-sketch cell build — one home (the hll_registers /
    cm_sketch lesson): (source, b, cnt) over the shared quality score,
    one algebraic count agg of per-row binning.  Algebraic, so the
    SAME builder runs as a stateful streaming aggregation (cell counts
    sum across micro-batches)."""
    from ..functions.text import quality_signals

    q = F.round(quality_signals("text").quality, 6)
    binned = docs.select(
        "source",
        F.least(F.lit(QSK_BINS - 1), F.floor(q * QSK_BINS)).cast("int").alias("b"),
    )
    return binned.groupBy("source", "b").agg(F.count("*").alias("cnt"))


def qsk_estimates(cells: DataFrame) -> DataFrame:
    """Finish a (source, b, cnt) cell table into per-source
    (n_docs, p50_est, p90_est): cumulative walk to the target rank
    ceil(p*n) with linear in-bin interpolation — windows over the tiny
    cell table only."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("source"))
    )

    def est(p):
        r = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")))
        hit = (F.col("cum") >= r) & (F.col("cum") - F.col("cnt") < r)
        inner = (
            (r - (F.col("cum") - F.col("cnt"))).cast("double") / F.col("cnt")
        )
        val = (F.col("b") + inner) / QSK_BINS
        return F.max(F.when(hit, F.round(val, 6)))

    return cum.groupBy("source").agg(
        F.max("n").cast("long").alias("n_docs"),
        est(0.5).alias("p50_est"),
        est(0.9).alias("p90_est"),
    )


def quantile_sketch_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile estimates (p50/p90 of the shared quality
    score) from a fixed 100-bin histogram sketch, audited in-output
    against the exact nearest-rank values — the third sketch of the
    family (HLL = cardinality, Count-Min = frequency, histogram =
    distribution), and the production substitute for
    quality_calibration's exact rank windows when the percentile
    dashboard must come from ONE algebraic pass.

    Why it scales where exact doesn't: the histogram is a fixed
    |sources| x 100 cell table built by one map-side-combined count
    agg — no per-source sort, no rank window over raw docs — and bins
    merge associatively across partitions/days (the sketch property).
    Estimation walks the cumulative bin counts (a window over the tiny
    cell table) to the target rank and interpolates linearly inside
    the bin: error is bounded by the bin width, reported exactly by
    the audit columns.

    Estimator (identical in the DuckDB oracle): for target rank
    r = ceil(p * n), find the first bin with cumulative count >= r;
    est = bin_lo + (r - cum_before) / bin_cnt * bin_width.
    """
    from ..functions.text import quality_signals

    docs = load_table(spark, sf_dir, "documents")
    q = F.round(quality_signals("text").quality, 6)
    cells = qsk_cells(docs)
    sk = qsk_estimates(cells)
    # exact nearest-rank audit (the quality_calibration scheme;
    # deterministic rank tiebreak on doc_id)
    from pyspark.sql import Window

    base = docs.select("doc_id", "source", q.alias("q"))
    wq = Window.partitionBy("source").orderBy("q", "doc_id")
    ranked = base.withColumn("rn", F.row_number().over(wq)).withColumn(
        "n", F.count("*").over(Window.partitionBy("source"))
    )
    exact = ranked.groupBy("source").agg(
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.ceil(0.5 * F.col("n"))),
                F.col("q"),
            )
        ).alias("p50_exact"),
        F.max(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.ceil(0.9 * F.col("n"))),
                F.col("q"),
            )
        ).alias("p90_exact"),
    )
    return sk.join(exact, "source").select(
        "source",
        "n_docs",
        "p50_est",
        "p50_exact",
        "p90_est",
        "p90_exact",
        F.round(F.abs(F.col("p50_est") - F.col("p50_exact")), 6).alias("err_p50"),
        F.round(F.abs(F.col("p90_est") - F.col("p90_exact")), 6).alias("err_p90"),
    )


def hll_union_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff of sketches being ALGEBRAIC: per-event-type HLL
    register tables are merged into a union sketch by a plain
    ``max(r)`` over buckets — no rescan of the events — and the merged
    registers estimate the distinct-user count of the UNION of all
    event types, reported next to each type's own row and the exact
    audit.  This is the cross-partition / cross-day / cross-stream
    combine written as a query: at 100 TB you keep |keys| x 1024
    registers per day and answer "distinct users this quarter" from
    kilobytes, which is exactly what the ALL row demonstrates (union
    cardinality != sum of per-type counts because users overlap).

    Scale shape: ONE corpus scan builds the per-type registers
    (algebraic max agg); the union row is a second max agg over the
    register TABLE (|types| x 1024 rows); estimator + exact audit join
    batch-side.  Shares hll_registers/hll_estimate with the batch and
    streaming variants — one sketch definition, four contexts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    regs = hll_registers(ev, "event_type", "u")
    union_regs = (
        regs.groupBy("bucket")
        .agg(F.max("r").alias("r"))
        .select(F.lit("ALL").alias("event_type"), "bucket", "r")
    )
    all_regs = regs.unionByName(union_regs)
    est = hll_estimate(all_regs, "event_type")
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("u").cast("long").alias("n_exact"))
        .unionByName(
            ev.agg(F.countDistinct("u").cast("long").alias("n_exact")).select(
                F.lit("ALL").alias("event_type"), "n_exact"
            )
        )
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_exact",
        F.round(F.col("hll_est"), 4).alias("n_hll"),
        F.round(
            (F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


def hll_intersect_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user INTERSECTION between event types,
    estimated from HLL registers by inclusion-exclusion:
    |A∩B| ~ E(A) + E(B) - E(A∪B), where E(A∪B) comes from the
    max-merged register pair — completing the sketch set-algebra
    (distinct, union, intersection) with the exact audit alongside.

    The honest caveat, visible in the output: intersection via
    inclusion-exclusion is a DIFFERENCE of estimates, so its relative
    error compounds the ~3.3% per-estimate error and degrades as the
    true intersection shrinks relative to the union — the reason
    production systems reach for theta/KMV sketches when small
    intersections matter.  The audit column measures exactly that.

    Scale shape: ONE register build (the shared hll_registers agg);
    the |types|^2 pair frame joins REGISTER tables (1024 rows/type),
    never events.  Pairwise-all types is inherently quadratic in
    |types| — for many keys you enumerate requested pairs instead.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    # regs feeds the single estimates AND the pair merge; it is a
    # |types| x 1024 aggregate, so recomputing beats holding cache
    # entries across bench reps (each consumer is one events pass)
    regs = hll_registers(ev, "event_type", "u")
    est_single = hll_estimate(regs, "event_type")
    types = regs.select("event_type").distinct()
    tp = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    # the pair key stays TWO real grouping columns through the
    # estimator (hll_estimate takes a key list) — the former
    # concat_ws('|')/split round-trip corrupted any event_type
    # containing the delimiter and silently mis-joined estimates.
    pair_regs = (
        tp.join(
            regs,
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .groupBy("ta", "tb", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est_union = hll_estimate(pair_regs, ["ta", "tb"]).select(
        "ta", "tb", F.col("hll_est").alias("e_union")
    )
    ea = est_single.select(
        F.col("event_type").alias("ta"), F.col("hll_est").alias("e_a")
    )
    eb = est_single.select(
        F.col("event_type").alias("tb"), F.col("hll_est").alias("e_b")
    )
    d = ev.distinct()
    exact = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.u") == F.col("y.u"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ta"),
            F.col("y.event_type").alias("tb"),
        )
        .agg(F.count("*").cast("long").alias("n_exact_inter"))
    )
    out = est_union.join(ea, "ta").join(eb, "tb").join(exact, ["ta", "tb"])
    inter = F.col("e_a") + F.col("e_b") - F.col("e_union")
    return out.select(
        "ta",
        "tb",
        "n_exact_inter",
        F.round(inter, 4).alias("n_hll_inter"),
        F.round(
            (inter - F.col("n_exact_inter")) / F.col("n_exact_inter"), 6
        ).alias("rel_err"),
    )


# KMV geometry: keep the K smallest 48-bit hash values per key.
# Cardinality: E(|X|) = (K-1) / theta, theta = K-th smallest hash
# mapped to (0,1].  Std error ~ 1/sqrt(K-2) ~ 6.3% at K=256.
KMV_K = 256
_KMV_SCALE = float(1 << 48)


def kmv_intersect_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user intersection via K-MINIMUM-VALUES
    sketches — the answer to hll_intersect_types' documented weakness:
    where HLL intersections are a DIFFERENCE of estimates (error
    compounds), a KMV/theta sketch supports intersection natively —
    the K smallest hashes of A∪B are a uniform sample of the union,
    so the fraction of them present in BOTH sketches estimates the
    Jaccard directly and |A∩B| = rho * E(|A∪B|) (Beyer et al. 2007 /
    the theta-sketch family).  Exact audit + rel_err in-output, as
    everywhere in the sketch family.

    Scale shape: ONE events pass builds all per-type sketches (rank
    window per type over the 48-bit md5 hash, keep rn <= K — the
    weighted_sample WindowGroupLimit shape, so the exchange moves
    ~K rows per (partition, type), never the corpus); every pair
    operation joins K-row sketch tables.  Sketches are mergeable:
    union = K smallest of the concatenated samples — demonstrated by
    construction in the pair frame.  All hashes are md5-derived
    integers, so the WHOLE estimator is reproduced in the DuckDB twin.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("u")
    )
    d = ev.distinct()
    hashed = d.select("event_type", "u", _hash48(F.col("u")).alias("hv"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "hv")
    )
    types = sk.select("event_type").distinct()
    tp = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    # union sample per pair: K smallest of the merged DISTINCT hashes
    both = tp.join(
        sk,
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    ).select("ta", "tb", "hv")
    merged = both.distinct()
    wp = Window.partitionBy("ta", "tb").orderBy("hv")
    union_k = (
        merged.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= KMV_K)
    )
    # rho: fraction of the union sample present in BOTH sketches
    ska = sk.select(F.col("event_type").alias("ta"), F.col("hv").alias("hv"))
    skb = sk.select(F.col("event_type").alias("tb"), F.col("hv").alias("hv"))
    flags = (
        union_k.join(ska.withColumn("ina", F.lit(1)), ["ta", "hv"], "left")
        .join(skb.withColumn("inb", F.lit(1)), ["tb", "hv"], "left")
        .groupBy("ta", "tb")
        .agg(
            F.count("*").alias("k_u"),
            F.max("hv").alias("theta_hv"),
            F.sum(
                (F.col("ina").isNotNull() & F.col("inb").isNotNull()).cast("int")
            ).alias("n_both"),
        )
    )
    theta = (F.col("theta_hv") + 1) / F.lit(_KMV_SCALE)
    # small-range branch: a sample smaller than K holds EVERY value of
    # the union, so the count is exact (the KMV analogue of HLL's
    # linear-counting correction)
    e_union = F.when(
        F.col("k_u") < KMV_K, F.col("k_u").cast("double")
    ).otherwise((F.col("k_u") - 1) / theta)
    inter = F.col("n_both") / F.col("k_u") * e_union
    exact = (
        d.alias("x")
        .join(
            d.alias("y"),
            (F.col("x.u") == F.col("y.u"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ta"),
            F.col("y.event_type").alias("tb"),
        )
        .agg(F.count("*").cast("long").alias("n_exact_inter"))
    )
    return flags.join(exact, ["ta", "tb"]).select(
        "ta",
        "tb",
        "n_exact_inter",
        F.round(inter, 4).alias("n_kmv_inter"),
        F.round(
            (inter - F.col("n_exact_inter")) / F.col("n_exact_inter"), 6
        ).alias("rel_err"),
    )
