"""Time-series operators over the ``events`` table (hypertable-style).

Extends the reference's per-key aggregation surface (SURVEY.md §2.2
"per-key statistics", `description.md:43` mean-max temperature) with
the two shapes a metrics/sensor pipeline always needs and plain
MapReduce cannot express without a stateful sorted reduce: regular-grid
resampling with forward fill, and time-range (not row-count) rolling
windows.

Scale notes (100 TB design point):
- Both operators shuffle once on ``user_id`` and do all window math
  within the partition — the same single-shuffle profile as
  ``sessionize``.  Skewed users would be the bottleneck; the grid size
  is bounded per user (hours between first and last event), so the
  gap-fill explode cannot amplify a hot key by more than the time span.
- All timestamp math is integer microseconds (``ts div 1000``), which
  matches DuckDB's ns->us truncation and avoids tz/rounding drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import event_ts_us, load_table

HOUR_US = 3_600_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts layout varies by data generation (timestamp[us] vs nanos-long);
    # event_ts_us adapts (see sources/tables.py).
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_us", event_ts_us(ev))


def gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream to an hourly grid and
    forward-fill gaps with the last observed hourly average.

    Plan shape: hourly pre-aggregate (one shuffle on user_id+bucket),
    per-user min/max bounds, ``sequence``+``explode`` to materialize the
    grid, left join the observations back, then ``last(ignorenulls)``
    over the user-partitioned window.  The hourly average is rounded
    BEFORE the fill so carried-forward values equal their source row
    exactly.
    """
    hourly = (
        _events_us(spark, sf_dir)
        .withColumn("bucket_us", F.col("ts_us") - F.col("ts_us") % HOUR_US)
        .groupBy("user_id", "bucket_us")
        .agg(F.round(F.avg("value"), 6).alias("hv"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket_us").alias("mn"), F.max("bucket_us").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.lit(HOUR_US))).alias("bucket_us"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket_us"], "left")
        .select(
            "user_id",
            "bucket_us",
            F.last("hv", ignorenulls=True).over(w).alias("value"),
            F.col("hv").isNotNull().cast("long").alias("is_observed"),
        )
    )


def rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour count and average by time RANGE (not
    row count): every event sees exactly the events of the same user in
    ``[ts - 1h, ts]``.  ``rangeBetween`` on integer microseconds makes
    the frame tie-stable — rows with equal ts always see each other
    regardless of shuffle order."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-HOUR_US, 0)
    )
    return _events_us(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view → click → purchase: per user,
    the first view, the first click strictly after it, and the first
    purchase strictly after that click; output is users reaching each
    stage.

    One user-keyed conditional aggregation computes all three stage
    timestamps algebraically (min-with-predicate chained via two short
    per-user joins), so the corpus shuffles once on user_id and the
    funnel arithmetic runs on the (|users| × 1) frame — the shape that
    survives a 100 TB event log.  Epoch-us integer math keeps the
    stage comparison exact across engines.
    """
    ev = _events_us(spark, sf_dir).select("user_id", "event_type", "ts_us")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_us").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )
    stages = [
        v.select(F.lit(1).alias("stage"), F.lit("view").alias("step"), "user_id"),
        c.select(F.lit(2).alias("stage"), F.lit("click").alias("step"), "user_id"),
        p.select(
            F.lit(3).alias("stage"), F.lit("purchase").alias("step"), "user_id"
        ),
    ]
    u = stages[0].union(stages[1]).union(stages[2])
    return u.groupBy("stage", "step").agg(
        F.countDistinct("user_id").alias("n_users")
    )


WEEK_US = 7 * 24 * 3_600_000_000


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, and
    for each (cohort_week, weeks_since) cell, how many of them were
    active that many weeks later.

    Two user-keyed aggregations (first-seen, then distinct user-week
    activity) and one join back on user_id — the active-users frame is
    |users × weeks-active| rows, never raw events, so the matrix
    computation is corpus-size-independent after the first agg.  Weeks
    are epoch-us integer buckets: exact across engines.
    """
    ev = _events_us(spark, sf_dir).select("user_id", "ts_us")
    week = (F.col("ts_us") - F.col("ts_us") % WEEK_US).alias("week_us")
    activity = ev.select("user_id", week).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week_us").alias("cohort_us"))
    return (
        activity.join(cohort, "user_id")
        .select(
            "cohort_us",
            ((F.col("week_us") - F.col("cohort_us")) / WEEK_US)
            .cast("long")
            .alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_us", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (event_type -> next event_type) step, the step
    count and the row-normalized transition probability.  The classic
    clickstream/product-analytics "what happens next" query, and the
    input a Markov-chain session model trains on.

    One user-keyed window (lead over (ts_us, event_id) — the same
    single-shuffle profile as sessionize; the event_id tiebreak makes
    same-microsecond orderings deterministic in both engines), then an
    algebraic hash-agg on the (from, to) pair.  The normalizing
    per-from totals come from a window over the AGGREGATED matrix —
    |event types|² rows, corpus-size-independent — never the raw
    stream.  prob is an exact int/int double division: bit-identical
    across engines, no rounding needed.
    """
    ev = _events_us(spark, sf_dir).select("user_id", "ts_us", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    mat = steps.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = F.sum("n").over(Window.partitionBy("from_type"))
    return mat.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / tot.cast("double")).alias("prob"),
    )


def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event ``value`` — each
    reading holds until the user's next event, so the average weights
    values by how long they were in force instead of per-event
    (the TimescaleDB ``time_weight('LOCF')`` semantics, the honest
    aggregate for irregularly-sampled gauges: a sensor that reports
    rarely while high must not dominate a per-event mean).

    Last-observation-carried-forward over [first event, last event):
    the final reading has no successor and carries no weight; users
    with one event have no interval and are absent (oracle mirrors).
    Duration math is integer epoch-microseconds end-to-end; only the
    final ratio is a double.

    Scale shape: ONE (user)-keyed window (lead) over user-sharded
    partitions, then an algebraic per-user agg that reuses the same
    partitioning — a single exchange; no self-join on the timeline.
    """
    ev = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dur = F.lead("ts_us").over(w) - F.col("ts_us")
    terms = ev.select("user_id", "value", dur.alias("dur")).filter(
        F.col("dur").isNotNull()
    )
    return terms.groupBy("user_id").agg(
        (F.count("*") + 1).cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("value") * F.col("dur")) / F.sum("dur").cast("double"), 6
        ).alias("twa_value"),
        F.round(F.avg("value"), 6).alias("naive_avg"),
    )


# EWMA smoothing constant, trailing-window width (rows), minimum
# history before a z-score is defined, and the anomaly threshold.
EWMA_ALPHA = 0.3
EWMA_WIN = 8
EWMA_MIN_N = 4
ANOM_Z = 2.5


def ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA ANOMALY DETECTION over the event value stream:
    each event is scored against the exponentially-weighted moving
    average and the standard deviation of its user's trailing EWMA_WIN
    events (strictly BEFORE it — no self-leakage), and events whose
    z-score clears ANOM_Z are emitted — the monitoring primitive
    (metric-spike detection, sensor-fault screening) every event
    pipeline runs next to sessionize/rolling_time_window.

    Exactness: unbounded-history EWMA is a recurrence (not expressible
    without exponent blow-up tricks), so the operator uses the
    BOUNDED-window form — the trailing EWMA_WIN values are gathered in
    frame order and folded left-to-right with the SAME textual
    fold expression the DuckDB oracle uses (first element as the seed,
    alpha*x + (1-alpha)*acc), and the variance terms come from two
    more folds over the same ordered list, so every double is produced
    by the identical IEEE operation sequence in both engines — the
    whole output hash-gates, floats included.

    Scale shape: ONE shuffle on user_id (the sessionize profile), all
    window math within the partition; the per-row list is EWMA_WIN
    elements (bounded — never whole-history), and the fold runs inside
    codegen.  Skewed users cost their row count, not quadratic.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-EWMA_WIN, -1)
    )
    a, b = repr(EWMA_ALPHA), repr(1 - EWMA_ALPHA)
    e = (
        _events_us(spark, sf_dir)
        .select("user_id", "event_id", "ts_us", "value")
        .withColumn("a", F.collect_list("value").over(w))
        .filter(F.size("a") >= EWMA_MIN_N)
        .withColumn(
            "ewma_prev",
            F.expr(
                f"reduce(slice(a, 2, greatest(size(a) - 1, 0)), "
                f"cast(element_at(a, 1) as double), "
                f"(acc, x) -> {a} * x + {b} * acc)"
            ),
        )
        .withColumn("n", F.size("a").cast("double"))
        .withColumn(
            "s1", F.expr("reduce(a, cast(0.0 as double), (acc, x) -> acc + x)")
        )
        .withColumn(
            "s2",
            F.expr("reduce(a, cast(0.0 as double), (acc, x) -> acc + x * x)"),
        )
        .withColumn(
            "sd",
            F.sqrt(
                F.greatest(
                    (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                    / (F.col("n") - 1),
                    F.lit(0.0),
                )
            ),
        )
        # when() guards the division: under ANSI mode Catalyst may
        # evaluate the projection before the sd > 0 filter runs.  The
        # z-score stays UNROUNDED here and in the output: both engines
        # produce bit-identical doubles (identical fold order), so the
        # raw comparison decides the row set identically, while an
        # explicit round(6) would re-introduce the one cross-engine
        # divergence (round-half boundaries, where Spark's HALF_UP on
        # the decimal expansion and DuckDB's scaled-double rounding
        # disagree) — the driver's own hash applies one rounding
        # implementation to both sides, which is the safe place.
        .withColumn(
            "zscore",
            F.when(
                F.col("sd") > 0,
                (F.col("value") - F.col("ewma_prev")) / F.col("sd"),
            ),
        )
        .filter(F.abs(F.col("zscore")) >= ANOM_Z)
    )
    return e.select(
        "user_id", "event_id", "ts_us", "value", "ewma_prev", "zscore"
    )


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERTABLE OHLC ROLLUP: per (event_type, 1-hour bucket), the
    open/high/low/close of ``value`` plus the event count — the
    financial-bar / sensor-rollup shape that plain bucket aggregation
    (:func:`~..operators.advanced.time_rollup`) can't express because
    open/close are ORDER-dependent picks inside an unordered group.

    Open/close are argmin/argmax by (ts, event_id) carried through a
    struct min/max — the keep_best_dedup idiom: lexicographic struct
    comparison makes the pick algebraic (map-side partials, trivially
    mergeable — which is also why this rolls up incrementally under
    streaming state), no window over raw events, and the event_id
    tiebreak makes it deterministic under equal timestamps.  Both
    engines compare the same (ts_us, event_id, value) tuples, so the
    picked doubles are bit-identical.

    Scale shape: ONE hash agg over (event_type, bucket) — the same
    single-shuffle profile as time_rollup; high/low/n are plain
    min/max/count.
    """
    e = _events_us(spark, sf_dir)
    bucket = (F.col("ts_us") - F.col("ts_us") % HOUR_US).alias("bucket_us")
    first = F.min(F.struct("ts_us", "event_id", "value"))
    last = F.max(F.struct("ts_us", "event_id", "value"))
    return (
        e.select("event_type", bucket, "ts_us", "event_id", "value")
        .groupBy("event_type", "bucket_us")
        .agg(
            first.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last.getField("value").alias("close"),
            F.count("*").cast("long").alias("n"),
        )
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-TYPE-2 HISTORY BUILD (gaps-and-islands): collapse each
    user's event stream into validity intervals of consecutive equal
    ``event_type`` runs — (user_id, run_idx, event_type, start_us,
    end_us, n_events) — the change-data shape a warehouse keeps for
    slowly-changing attributes, and the run-length view of a
    clickstream (how long did the user stay in each activity?).

    The classic two-window build: a lag-change flag, a running sum
    over the flags to number the runs, then one agg per run.  All
    integers and exact picks — fully oracle-exact.

    Scale shape: ONE shuffle on user_id shared by both windows and
    the final agg (same partitioning — Spark reuses the exchange);
    within-partition sorts are the only extra cost.  The sessionize
    profile with a second window over the same exchange.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    e = (
        _events_us(spark, sf_dir)
        .select("user_id", "event_id", "ts_us", "event_type")
        .withColumn(
            "chg",
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("run_idx", F.sum("chg").over(wrun))
    )
    return e.groupBy("user_id", "run_idx", "event_type").agg(
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.count("*").cast("long").alias("n_events"),
    )


def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK-CONCURRENCY SWEEP per event type: treat each user's
    [first event, last event] span of a type as an activity interval
    and report how many users were simultaneously active at the
    busiest instant — the capacity-planning / concurrent-sessions
    number every event platform reports, and the classic sweep-line
    algorithm expressed relationally.

    conc(ts) = #intervals with start <= ts AND end >= ts is evaluated
    only at interval-start boundaries (a maximum of a step function
    that rises only at starts is attained at a start), as a running
    sum over per-timestamp NET deltas: boundaries are pre-aggregated
    per (type, ts) into (n_starts, n_ends_before), so the running sum
    is order-independent within a timestamp — no tie-order flake, and
    both engines fold the identical integer sequence.  peak_ts is the
    EARLIEST timestamp attaining the peak (deterministic argmin).

    Scale shape: one (user, type) agg for intervals, one (type, ts)
    boundary agg, one type-partitioned running-sum window, one final
    argmax agg — all keyed shuffles; boundary volume is 2 rows per
    (user, type), tiny next to the event stream.
    """
    e = _events_us(spark, sf_dir)
    iv = e.groupBy("event_type", "user_id").agg(
        F.min("ts_us").alias("s"), F.max("ts_us").alias("e")
    )
    starts = iv.select(
        "event_type", F.col("s").alias("ts"),
        F.lit(1).alias("ds"), F.lit(0).alias("de"),
    )
    # an interval [s, e] stops covering ts only for ts > e: emit the
    # end delta at e (applied to LATER boundaries via the exclusive
    # running end-sum below)
    ends = iv.select(
        "event_type", F.col("e").alias("ts"),
        F.lit(0).alias("ds"), F.lit(1).alias("de"),
    )
    bnd = (
        starts.union(ends)
        .groupBy("event_type", "ts")
        .agg(F.sum("ds").alias("ns"), F.sum("de").alias("ne"))
    )
    w = Window.partitionBy("event_type").orderBy("ts")
    cum_s = F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0))
    cum_e_before = F.coalesce(
        F.sum("ne").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    conc = (
        bnd.withColumn("conc", (cum_s - cum_e_before).cast("long"))
        .filter(F.col("ns") > 0)  # evaluate at start boundaries only
    )
    return conc.groupBy("event_type").agg(
        F.countDistinct("ts").cast("long").alias("n_boundaries"),
        F.max("conc").alias("peak_concurrency"),
        F.min_by("ts", F.struct(-F.col("conc"), F.col("ts"))).alias("peak_ts_us"),
    )


# Robust z-score cut for the MAD screen (3.5 is the Iglewicz-Hoaglin
# convention) and the normal-consistency constant.
MAD_Z = 3.5
MAD_K = 1.4826


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN-ABSOLUTE-DEVIATION outlier screen per event type: the
    robust complement of :func:`ewma_anomaly` — mean/stddev screens
    are dragged by the very outliers they hunt, while the median and
    MAD = median(|x - med|) have a 50% breakdown point
    (Iglewicz-Hoaglin; Hampel).  Emits events whose robust z-score
    |x - med| / (MAD_K * MAD) clears MAD_Z.

    Cross-engine exactness: both engines compute the interpolating
    median of the SAME double multiset (identical (lo+hi)/2
    arithmetic), then identical subtraction/abs/division — raw
    doubles out, no explicit rounding (the ewma_anomaly lesson).

    Scale shape: exact medians need a per-group sort — two
    type-keyed aggs (median, then MAD over the residuals) and one
    broadcast-sized (5-row) stats join back to the stream.  At 100 TB
    swap the exact median for approx_percentile and keep the shape.
    """
    e = _events_us(spark, sf_dir)
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("med")).alias("ad"))
        .groupBy("event_type")
        .agg(F.median("ad").alias("mad"))
    )
    stats = med.join(mad, "event_type")
    rz = F.abs(F.col("value") - F.col("med")) / (F.lit(MAD_K) * F.col("mad"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("robust_z", rz)
        .filter(F.col("robust_z") >= MAD_Z)
        .select("event_id", "event_type", "value", "med", "mad", "robust_z")
    )


def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-STEP PATH MINING: counts of consecutive event-type triples
    along each user's timeline — the path-frequency table funnel
    designers read (event_transitions is the 2-step Markov view; this
    is the order-3 extension that distinguishes view->cart->buy from
    cart->view->buy).

    Consecutiveness is defined by the (ts_us, event_id) order within
    a user — the same deterministic tie-break every sequence operator
    here uses, so both engines window over the identical order.  All
    integers.

    Scale shape: ONE user-keyed shuffle shared by both lead() windows
    and nothing else; the trigram agg output is bounded by |types|³.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = (
        _events_us(spark, sf_dir)
        .select("user_id", "ts_us", "event_id", "event_type")
        .withColumn("s2", F.lead("event_type", 1).over(w))
        .withColumn("s3", F.lead("event_type", 2).over(w))
        .filter(F.col("s3").isNotNull())
    )
    return e.groupBy(
        F.col("event_type").alias("s1"), "s2", "s3"
    ).agg(F.count("*").cast("long").alias("cnt"))


DAY_US = 86_400_000_000


def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS activity streaks: per user, group the DISTINCT
    active days (days with >=1 event) into maximal runs of consecutive
    days — the classic islands problem (day − row_number is constant
    within an island) that powers "current streak / longest streak"
    engagement metrics and cannot be written as a plain group-by.

    All arithmetic is integer: day index = ts_us div DAY_US, island
    key = day − rn.  Output per user: total active days, number of
    islands, longest streak, and the start day of that longest streak
    (earliest if tied — deterministic min).

    Scale shape: distinct + window + two aggs, ALL keyed on user_id —
    Spark reuses one hash partitioning for the whole chain (a single
    shuffle), and per-user state is bounded by the calendar span.
    """
    e = _events_us(spark, sf_dir).select(
        "user_id",
        ((F.col("ts_us") - F.col("ts_us") % DAY_US) / F.lit(DAY_US))
        .cast("long").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = e.withColumn(
        "grp", F.col("day") - F.row_number().over(w)
    ).groupBy("user_id", "grp").agg(
        F.count("*").cast("long").alias("len"),
        F.min("day").cast("long").alias("start_day"),
    )
    wu = Window.partitionBy("user_id")
    return (
        isl.withColumn("wmax", F.max("len").over(wu))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("active_days"),
            F.count("*").cast("long").alias("n_islands"),
            F.max("len").cast("long").alias("max_streak"),
            F.min(
                F.when(F.col("len") == F.col("wmax"), F.col("start_day"))
            ).cast("long").alias("max_streak_start"),
        )
    )


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve for view→purchase conversion: per
    user, duration = whole hours from FIRST event to FIRST purchase
    (event observed) or to the LAST event (right-censored, no
    purchase) — the product-limit estimator S(t) = Π_{tᵢ≤t}
    (1 − dᵢ/nᵢ) that funnel half-life and time-to-convert reporting
    are built on, with censoring handled correctly (naive "mean time
    to convert over converters" is biased).

    Cross-engine exactness: durations are integer hours; nᵢ (at
    risk) and dᵢ (events at tᵢ) are exact integer window sums; the
    running product is exp(Σ ln(1 − d/n)) over identical doubles —
    ulp-level libm drift across a few hundred terms stays ~1e-13,
    absorbed by round(·, 6).  A step where d = n (everyone at risk
    converts) forces S = 0 from that point on; both engines apply
    the same CASE guard instead of ln(0).

    Scale shape: one user-keyed agg to build (duration, observed)
    per user, then an agg + two windows over the tiny distinct-
    duration axis (bounded by the time span in hours, not by rows).
    """
    e = _events_us(spark, sf_dir)
    per_user = e.groupBy("user_id").agg(
        F.min("ts_us").alias("t0"),
        F.max("ts_us").alias("t_last"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_us"))
        ).alias("t_buy"),
    )
    durs = per_user.select(
        F.when(F.col("t_buy").isNotNull(), F.col("t_buy") - F.col("t0"))
        .otherwise(F.col("t_last") - F.col("t0")).alias("dur_us"),
        F.col("t_buy").isNotNull().cast("int").alias("observed"),
    ).select(
        ((F.col("dur_us") - F.col("dur_us") % HOUR_US) / F.lit(HOUR_US))
        .cast("long").alias("t_hours"),
        "observed",
    )
    by_t = durs.groupBy("t_hours").agg(
        F.count("*").cast("long").alias("n_total"),
        F.sum("observed").cast("long").alias("d"),
    )
    wdesc = Window.orderBy(F.col("t_hours").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    wasc = Window.orderBy(F.col("t_hours").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = by_t.withColumn(
        "n_risk", F.sum("n_total").over(wdesc).cast("long")
    ).filter(F.col("d") > 0)
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double")),
    ).otherwise(F.lit(None).cast("double"))
    return (
        risk.withColumn("lt", term)
        .withColumn("dead", F.max((F.col("d") == F.col("n_risk")).cast("int")).over(wasc))
        .select(
            "t_hours",
            "n_risk",
            F.col("d").alias("n_events"),
            F.when(F.col("dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.sum("lt").over(wasc)), 6))
            .alias("surv"),
        )
    )


def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATE-DRIFT DETECTION per event type via an integer CUSUM over
    hourly event counts: with hourly counts c_1..c_T (total C), the
    scaled cumulative deviation at hour i is

        drift_i = |T * prefix_i  -  i * C|

    — T times the classic CUSUM against the mean rate C/T, kept in
    BIGINT so the whole trajectory (and the reported argmax) is exact
    integer arithmetic, no float mean anywhere.  The peak hour is
    where the event rate regime shifts (ingestion gaps, burst starts)
    — the monitoring pass a pipeline runs before trusting
    time-windowed aggregates of a feed.  Ties take the earliest hour.

    Scale shape: one (type, hour)-keyed count agg (map-side partials)
    collapses the corpus to T rows per type; the prefix sum and the
    totals are windows over that tiny frame (type-partitioned — no
    global single-partition window); one argmax row_number picks the
    peak.  Nothing after the first agg touches corpus-scale data.
    """
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.select(
            "event_type",
            # exact integer hour: subtract the modulo before the divide
            # so the double division is of an exact multiple (ts is
            # positive epoch micros, so truncation == floor, matching
            # the oracle's integer //)
            (
                (event_ts_us(ev) - event_ts_us(ev) % F.lit(3_600_000_000))
                / F.lit(3_600_000_000)
            )
            .cast("long")
            .alias("hour_bucket"),
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wseq = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    pref = hours.select(
        "event_type",
        "hour_bucket",
        F.sum("c").over(wseq).alias("prefix"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("hour_bucket"))
        .cast("long")
        .alias("i"),
        F.sum("c").over(wall).alias("total"),
        F.count("*").over(wall).cast("long").alias("t_hours"),
    )
    drift = pref.select(
        "event_type",
        "hour_bucket",
        "i",
        "t_hours",
        "total",
        F.abs(
            F.col("t_hours") * F.col("prefix") - F.col("i") * F.col("total")
        ).alias("drift"),
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.desc("drift"), F.col("hour_bucket")
    )
    return (
        drift.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour_bucket").alias("peak_hour"),
            F.col("drift").alias("max_drift"),
            "t_hours",
            F.col("total").alias("n_events"),
        )
    )
