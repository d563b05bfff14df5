"""Structured Streaming: windowed event rollups with late-data handling.

The streaming expression of the batch ``events_hourly`` query
(entry_queries): tumbling event-time windows with a watermark so late
events are folded in up to the allowed delay and state is bounded.
Post-parity extension — the reference has no streaming (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Works on both a streaming DataFrame (bounded state via the
    watermark) and a batch DataFrame (watermark is a no-op) — one
    definition, two execution modes, which is the point of expressing
    the rollup in Structured Streaming's model.
    """
    withm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        withm.groupBy(
            F.window(F.col(ts_col), window_size).alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "value_sum_micros"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum_micros",
        )
    )


DEFAULT_SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 minutes


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str | None = "value",
    gap_ns: int = DEFAULT_SESSION_GAP_NS,
) -> DataFrame:
    """Gap-based sessionization over nanosecond-long event times.

    A new session starts when the gap since the user's previous event is
    strictly ``> gap_ns`` — the exact merge rule of Spark's native
    ``session_window`` (an event at ``prev + gap`` still merges: the
    session extends to ``prev + gap`` inclusive), so this
    window-function formulation and the ``session_window`` streaming
    twin below agree row-for-row; a pytest asserts the equivalence on
    randomized data that includes exact-boundary gaps.

    Returns ``(user_id, session_id, session_start, session_end,
    n_events, value_sum_micros)`` with ``session_id`` numbered 1..n per
    user in time order. Plan shape: one shuffle on ``user_col`` — the
    running-sum window partitions by user, and the follow-up group on
    ``(user, session)`` reuses that partitioning (hash partitioning on
    a subset of the grouping keys satisfies the aggregation's
    distribution requirement), so sessions never re-shuffle. Per-user
    data is bounded (one user's events fit a task), which is what makes
    gap sessionization distributable at 100 TB.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_ns), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:  # tables without a value column: pass None
        aggs.append(
            F.sum(F.floor(F.col(value_col) * 1_000_000).cast("long")).alias(
                "value_sum_micros"
            )
        )
    return (
        events.withColumn("__new", new_sess)
        .withColumn("session_id", F.sum("__new").over(run))
        .groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(*aggs)
    )


def asof_join_prior(
    events: DataFrame,
    *,
    left_type: str,
    right_type: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """As-of join within one event timeline: for every event of
    ``left_type``, attach the same user's most recent *strictly prior*
    event of ``right_type`` (purchase→last-click attribution shape).

    Formulated as a single carried-state window rather than a
    point-in-time self-join: ``last(..., ignorenulls)`` over the
    user's time-ordered rows forwards the latest right-side event to
    every subsequent row. One shuffle on ``user_col``, no range-join
    candidate explosion, state per user is one row — the distributed
    as-of shape that survives 100 TB (a naive ``l.ts >= r.ts`` join is
    quadratic per user before its top-1 filter).

    Ordering is ``(ts, id)``; a right-type event that ties a left-type
    event on ``ts`` counts as prior iff its id is smaller —
    deterministic in both engines. Returns ``(event_id, user_id, ts,
    prior_event_id, prior_ts, prior_value, gap_ns)`` with nulls when
    no prior right-type event exists; ``gap_ns`` assumes ``ts_col``
    holds epoch nanoseconds (``read_events_ns``).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_right = F.col(type_col) == right_type

    def carried(col, name):
        return F.last(F.when(is_right, F.col(col)), ignorenulls=True).over(
            w
        ).alias(name)

    return (
        events.select(
            F.col(id_col).alias("event_id"),
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("__type"),
            carried(id_col, "prior_event_id"),
            carried(ts_col, "prior_ts"),
            carried(value_col, "prior_value"),
        )
        .filter(F.col("__type") == left_type)
        .select(
            "event_id",
            "user_id",
            "ts",
            "prior_event_id",
            "prior_ts",
            "prior_value",
            (F.col("ts") - F.col("prior_ts")).alias("gap_ns"),
        )
    )


def session_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """The same sessions via native ``session_window`` — the streaming
    expression (works in batch too; in streaming the watermark closes
    sessions and bounds state). ``ts_col`` must be a real TIMESTAMP
    here; callers holding nanosecond longs cast with
    ``(ts/1e9).cast("timestamp")``.

    Returns ``(user_id, session_start, session_end_gap, n_events)``
    where ``session_end_gap`` is ``session_window.end`` = last event
    + gap (Spark's convention), NOT the last-event time ``sessionize``
    reports — equivalence tests compare on (user, start, n_events).
    """
    withm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        withm.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"),
            F.col(user_col).alias("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end_gap"),
            "n_events",
        )
    )


def start_session_rollup(
    events_stream: DataFrame,
    checkpoint_dir: str,
    *,
    queryName: str = "events_sessions",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    trigger_available_now: bool = False,
):
    """Run gap sessionization as a streaming query (memory sink).

    ``complete`` mode: session-window aggregation does not support
    ``update`` output (Spark restriction — merged sessions can't be
    retracted incrementally); production sinks would use ``append``,
    where the watermark closes sessions and bounds state."""
    writer = (
        session_rollup(events_stream, gap=gap, watermark=watermark)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_hourly_rollup(
    events_stream: DataFrame,
    checkpoint_dir: str,
    *,
    queryName: str = "events_hourly_rollup",
    trigger_available_now: bool = False,
    output_mode: str = "complete",
):
    """Run the rollup as a streaming query into an in-memory sink
    (swap for a Delta/parquet sink in production — and switch to
    ``append``, where the watermark closes windows; a memory sink in
    append mode would emit nothing until a later batch advances the
    watermark past a window end)."""
    writer = (
        hourly_rollup(events_stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sliding_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding-window counts/sums per event_type: every event lands in
    ``window_size / slide`` overlapping windows (epoch-aligned, Spark's
    native ``F.window`` slide semantics). Same one-definition/two-modes
    contract as ``hourly_rollup``: streaming input gets bounded state
    via the watermark; batch input runs identically with the watermark
    as a no-op. State is (windows per event) × (open windows within the
    watermark horizon) — bounded, and the per-window aggregates are
    map-side combinable int sums.
    """
    withm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        withm.groupBy(
            F.window(F.col(ts_col), window_size, slide).alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "value_sum_micros"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum_micros",
        )
    )


def start_sliding_rollup(
    events_stream: DataFrame,
    checkpoint_dir: str,
    *,
    queryName: str = "events_sliding_rollup",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    trigger_available_now: bool = False,
    output_mode: str = "complete",
):
    """Run the sliding rollup as a streaming query (memory sink for
    tests; production would append to a table sink with the watermark
    closing windows)."""
    writer = (
        sliding_rollup(events_stream, window_size=window_size, slide=slide)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def props_rollup(
    events: DataFrame,
    *,
    props_col: str = "props",
    type_col: str = "event_type",
) -> DataFrame:
    """Typed JSON extraction + rollup: parse the ``props`` JSON column
    with a declared schema (``from_json`` — JVM-side, codegen; never a
    Python json.loads UDF) and aggregate the ``k`` payload per event
    type.

    Returns ``(event_type, n_events, n_with_k, sum_k, min_k, max_k)``.
    Scale shape: scan-local parse projection, one map-side-combined
    aggregation to |event types| rows. Malformed JSON yields NULL
    (counted out of ``n_with_k``) rather than failing the job —
    from_json's PERMISSIVE default, the right posture for 100 TB of
    dirty logs.
    """
    k = F.from_json(F.col(props_col), "k BIGINT")["k"]
    return (
        events.select(F.col(type_col).alias("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.coalesce(F.sum("k"), F.lit(0)).alias("sum_k"),
            F.coalesce(F.min("k"), F.lit(-1)).alias("min_k"),
            F.coalesce(F.max("k"), F.lit(-1)).alias("max_k"),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    window_ns: int = 3_600_000_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Interval (time-range) join: pair each left event with every
    right event of the same user in ``(l.ts, l.ts + window_ns]`` —
    the click→conversion-window shape.

    An equi-join on ``user_col`` with the time band as a residual
    condition: the shuffle key is the user, so candidate pairs are
    bounded per user (never a time-only range join, which would be a
    near-cartesian band join at corpus scale). Returns
    ``(user_id, left_id, left_ts, right_id, right_ts, delta_ns)``.

    The same definition runs as a stream-stream join: with watermarks
    on both inputs Spark bounds the join state to the window span —
    see :func:`streaming_interval_join`.
    """
    lt = left.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    )
    rt = right.select(
        F.col(user_col).alias("__r_user"),
        F.col(id_col).alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    )
    return (
        lt.join(
            rt,
            (F.col("user_id") == F.col("__r_user"))
            & (F.col("right_ts") > F.col("left_ts"))
            & (F.col("right_ts") <= F.col("left_ts") + F.lit(window_ns)),
        )
        .select(
            "user_id",
            "left_id",
            "left_ts",
            "right_id",
            "right_ts",
            (F.col("right_ts") - F.col("left_ts")).alias("delta_ns"),
        )
    )


def streaming_interval_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Stream-stream interval join with bounded state: both sides are
    watermarked and the join condition carries the time band, so Spark
    evicts buffered rows once they fall behind the watermark + window
    horizon (unbounded-state stream joins are rejected by the planner
    in append mode). ``ts_col`` must be a TIMESTAMP column here —
    nanosecond-long holders cast with ``timestamp_seconds(ts div 1e9)``.
    """
    lt = left_stream.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("left_id"),
        F.col(ts_col).alias("left_ts"),
    ).withWatermark("left_ts", watermark)
    rt = right_stream.select(
        F.col(user_col).alias("__r_user"),
        F.col(id_col).alias("right_id"),
        F.col(ts_col).alias("right_ts"),
    ).withWatermark("right_ts", watermark)
    return lt.join(
        rt,
        (F.col("user_id") == F.col("__r_user"))
        & (F.col("right_ts") > F.col("left_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr(f"INTERVAL {window}")
        ),
    ).select(
        "user_id",
        "left_id",
        "left_ts",
        "right_id",
        "right_ts",
    )


def rolling_anomalies(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_buckets: int = 24,
    z2_threshold: int = 9,
) -> DataFrame:
    """Windowed anomaly detection over the hourly event-volume series,
    in EXACT integer arithmetic: an hour is anomalous when its
    micro-scaled value sum deviates from the trailing
    ``window_buckets``-hour mean by more than ``sqrt(z2_threshold)``
    standard deviations.

    The z-test is evaluated without ever forming a float mean or
    variance — with ``S = Σx`` and ``S2 = Σx²`` over the trailing
    window (current bucket excluded), ``|x − S/n| > z·σ`` is
    equivalent to ``n·(n·x − S)² > z²·(n·S2 − S²)`` — all integer
    terms, so the flag (and every intermediate) is bit-reproducible
    by the SQL oracle: no float-summation-order hazard, which a
    ``stddev`` window aggregate cannot guarantee across engines.

    Scale shape: one map-side-combined hourly aggregation, then a
    per-event-type ordered window (|buckets| rows per type — tiny).
    Returns ``(hour_start, event_type, value_sum_micros, n_window,
    is_anomaly)`` for buckets with a full trailing window.
    """
    if window_buckets < 2:
        raise ValueError("window_buckets must be >= 2")
    hourly = (
        events.groupBy(
            (F.col(ts_col) - (F.col(ts_col) % 3_600_000_000_000)).alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "x"
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-window_buckets, -1)
    )
    # the cubic terms exceed int64 at realistic hourly sums — carry
    # them in decimal(38,0) (exact, matches DuckDB HUGEINT); only
    # long/bool columns are emitted
    dec = "decimal(38,0)"
    n = F.count("x").over(w)
    nd = n.cast(dec)
    xd = F.col("x").cast(dec)
    s = F.sum("x").over(w).cast(dec)
    s2 = F.sum(
        F.col("x").cast(dec) * F.col("x").cast(dec)
    ).over(w)
    lhs = nd * (nd * xd - s) * (nd * xd - s)
    rhs = F.lit(z2_threshold).cast(dec) * nd * (nd * s2 - s * s)
    return (
        hourly.select(
            "hour_start",
            "event_type",
            F.col("x").alias("value_sum_micros"),
            n.alias("n_window"),
            (lhs > rhs).alias("is_anomaly"),
        )
        .filter(F.col("n_window") == window_buckets)
    )


def funnel_counts(
    events: DataFrame,
    steps: list,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel analysis: how many users progressed through each prefix
    of ``steps`` *in order* (subsequence match over the user's
    time-ordered timeline — other events may interleave).

    Returns one row per funnel depth: ``(step_idx, step, n_users)``
    where ``n_users`` counts users whose timeline contains
    ``steps[0..step_idx]`` as a subsequence (monotonically
    non-increasing with depth).

    Scale shape: one shuffle on the user key; each user's ordered
    type sequence folds through a small greedy automaton expressed as
    ``aggregate`` over ``collect_list`` (codegen, no UDF) — state is
    one int per user. Per-user event counts bound task memory the
    same way sessionization's do.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    per_user = (
        events.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(id_col).alias("id"),
                        F.col(type_col).alias("t"),
                    )
                )
            ).alias("__tl")
        )
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # greedy subsequence automaton: depth advances when the next
    # needed step appears
    depth = F.aggregate(
        "__tl",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(len(steps)))
            & (e["t"] == F.element_at(steps_lit, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    depths = per_user.select(depth.alias("__depth"))
    out = depths.groupBy().agg(
        *[
            F.sum((F.col("__depth") >= i + 1).cast("long")).alias(
                f"__n_{i}"
            )
            for i in range(len(steps))
        ]
    )
    rows = out.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.coalesce(F.col(f"__n_{i}"), F.lit(0)).alias(
                            "n_users"
                        ),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return rows.select("r.step_idx", "r.step", "r.n_users")


def retention_cohorts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_ns: int = 7 * 24 * 3_600_000_000_000,
) -> DataFrame:
    """Retention matrix: users grouped by first-activity bucket
    (cohort week by default), counted in each later bucket they were
    active — the classic cohort-retention analytics query.

    Returns ``(cohort_bucket, bucket_offset, n_users)``; offset 0 is
    the cohort itself, so its count is the cohort size.

    Scale shape: first-activity via one MIN aggregation on the user
    key; activity buckets dedup per (user, bucket) map-side; the final
    matrix is |cohorts| × |offsets| — tiny. All integer arithmetic.
    """
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_ns).alias("__b")
    active = events.select(
        F.col(user_col).alias("user_id"), bucket
    ).distinct()
    first = active.groupBy("user_id").agg(F.min("__b").alias("__cohort"))
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("__cohort").alias("cohort_bucket"),
            ((F.col("__b") - F.col("__cohort")) / bucket_ns)
            .cast("long")
            .alias("bucket_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


def transition_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Path analysis: the event-type transition matrix — for every
    consecutive pair in a user's time-ordered timeline, count
    ``(from_type, to_type)`` occurrences (the input to Sankey/flow
    charts and first-order Markov behavior models).

    One shuffle on the user key (the ``lead`` window), then a
    map-side-combined count over ≤ |types|² keys. Integer output —
    exact across engines. Normalize to probabilities downstream if
    needed (that division is where float variance would creep in).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )


def active_users(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    day_ns: int = 24 * 3_600_000_000_000,
    window_days: int = 7,
) -> DataFrame:
    """Activity metrics per day: DAU (distinct users that day) and
    trailing WAU (distinct users over the last ``window_days`` days) —
    the engagement/stickiness pair (DAU/WAU ratio downstream).

    Distinct-over-sliding-window doesn't decompose into window
    aggregates, so the WAU is computed by fanning each (user, day)
    activity pair out to the ``window_days`` day-buckets it keeps the
    user "active" in — a bounded explode (×7) of the deduplicated
    per-day pairs, NOT of raw events — then one distinct count per
    bucket. All integer arithmetic. Days with no activity in the data
    simply don't appear (no zero-fill).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = (F.col(ts_col) - F.col(ts_col) % day_ns).alias("day_bucket")
    pairs = events.select(
        F.col(user_col).alias("user_id"), day
    ).distinct()
    dau = pairs.groupBy("day_bucket").agg(
        F.count("*").alias("dau")
    )
    fanned = pairs.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day_bucket"),
                F.col("day_bucket") + F.lit((window_days - 1) * day_ns),
                F.lit(day_ns),
            )
        ).alias("day_bucket"),
    )
    wau = (
        fanned.groupBy("day_bucket")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    # only days that actually had activity (fanned extends past the
    # data's horizon); inner join restricts to real days
    return dau.join(wau, "day_bucket").select(
        "day_bucket", "dau", "wau"
    )


def asof_join_next(
    events: DataFrame,
    *,
    left_type: str,
    right_type: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Forward as-of: for every ``left_type`` event, the same user's
    EARLIEST strictly-later ``right_type`` event — the
    click→next-purchase conversion-lag shape, the time-mirror of
    :func:`asof_join_prior` (same single user-key shuffle, carried
    state window run over the reversed ordering; no range-join
    explosion). Ties on ``ts`` count as later iff the id is larger.
    Returns ``(event_id, user_id, ts, next_event_id, next_ts,
    next_value, gap_ns)`` with nulls when no later right-type event
    exists."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_right = F.col(type_col) == right_type

    def carried(col, name):
        return F.last(F.when(is_right, F.col(col)), ignorenulls=True).over(
            w
        ).alias(name)

    return (
        events.select(
            F.col(id_col).alias("event_id"),
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("__type"),
            carried(id_col, "next_event_id"),
            carried(ts_col, "next_ts"),
            carried(value_col, "next_value"),
        )
        .filter(F.col("__type") == left_type)
        .select(
            "event_id",
            "user_id",
            "ts",
            "next_event_id",
            "next_ts",
            "next_value",
            (F.col("next_ts") - F.col("ts")).alias("gap_ns"),
        )
    )


def running_revenue(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    type_col: str = "event_type",
    event_type: str = "purchase",
) -> DataFrame:
    """Per-user running revenue: cumulative purchase value over the
    user's time-ordered purchases — the LTV-curve prefix sum. Value
    accumulates as integer cents so the running total is exact and
    order-of-partial-sums-independent. One user-key shuffle; the
    window never holds more than one user's rows.

    Returns ``(event_id, user_id, ts, value_cents, running_cents,
    purchase_seq)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    cents = F.floor(F.col(value_col) * F.lit(100)).cast("long")
    return (
        events.filter(F.col(type_col) == event_type)
        .select(
            F.col(id_col).alias("event_id"),
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            cents.alias("value_cents"),
        )
        .withColumn(
            "running_cents",
            F.sum("value_cents").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "purchase_seq",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
    )


def value_histogram(
    events: DataFrame,
    *,
    value_col: str = "value",
    type_col: str = "event_type",
    event_type: str = "purchase",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Fixed-width histogram of event values: ``(bucket, bucket_lo,
    n_events, sum_cents)`` with bucket = floor(value / width). The
    whole histogram is one map-side-combined aggregation — the shape
    that stays a single shuffle of |buckets| rows at any corpus size
    (vs quantile sketches when the distribution's range is unknown)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    b = F.floor(F.col(value_col) / F.lit(bucket_width)).cast("long")
    return (
        events.filter(F.col(type_col) == event_type)
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col(value_col) * F.lit(100)).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            "bucket",
            (F.col("bucket") * F.lit(bucket_width)).alias("bucket_lo"),
            "n_events",
            "sum_cents",
        )
        .orderBy("bucket")
    )


def pivot_counts(
    events: DataFrame,
    *,
    row_key: str = "user_id",
    pivot_col: str = "event_type",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Wide per-key report: one row per ``row_key`` with a count
    column per ``pivot_col`` value — the pivot shape every BI layer
    asks for.

    ``pivot_values`` should be passed explicitly at scale (here it
    must be: Spark would otherwise run a distinct scan to discover
    the columns, and an unbounded value set would mint unbounded
    columns). One groupBy shuffle; the pivot itself is a map-side
    conditional-count projection, not extra movement.
    """
    if not pivot_values:
        raise ValueError("pivot_values must be a non-empty list")
    aggs = [
        F.sum(
            F.when(F.col(pivot_col) == v, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"n_{v}")
        for v in pivot_values
    ]
    return (
        events.groupBy(row_key).agg(*aggs).orderBy(row_key)
    )


def latest_by_key(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Keep each key's LATEST row — the CDC/upsert compaction step
    (dedup a change stream down to current state). Ties on
    ``order_col`` break by ``tiebreak_col`` DESC, so the result is
    deterministic under replay.

    One hash shuffle on the key; Spark 4 plants a partial
    WindowGroupLimit below the exchange, so each map task forwards
    one candidate row per key, not the full history.
    """
    keys = key_cols or ["user_id"]
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_intervals(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse each
    key's change stream into validity intervals ``(key, attr,
    valid_from, valid_to)``, ``valid_to`` NULL on the current row.

    Consecutive rows with the SAME attribute merge into one interval
    (the island step: a change flag → running island id → min/max per
    island). One key shuffle feeds both windows and the final
    aggregation — the exchange is reused.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    changed = (
        F.lag(attr_col).over(w).isNull()
        | (F.lag(attr_col).over(w) != F.col(attr_col))
    ).cast("int")
    island = F.sum("__chg").over(
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = (
        events.select(
            key_col, attr_col, ts_col, tiebreak_col
        )
        .withColumn("__chg", changed)
        .withColumn("__island", island)
    )
    per_island = staged.groupBy(key_col, "__island").agg(
        F.first(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
    )
    nxt = Window.partitionBy(key_col).orderBy("valid_from")
    return per_island.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
    ).orderBy(key_col, "valid_from")


def resample_ffill(
    events: DataFrame,
    *,
    step_ns: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Regularize each key's irregular event stream onto a fixed time
    grid with forward fill: ``(user, tick_ns, value_ffill)`` at every
    ``step_ns`` multiple between the key's first and last event;
    value = the latest observation at or before the tick (ties on
    timestamp break by ``tiebreak_col``, the replay-stable rule).

    The gap-filling/resampling step every time-series store exposes
    (``date_bin`` + LOCF), as a pure DataFrame plan: per-key bounds →
    in-plan ``sequence()`` grid → union of grid ticks and real events
    → ONE key-partitioned window whose ``last(value) IGNORE NULLS``
    carries the observation forward. Grid rows sort after same-ts
    events, so a tick ON an event time sees that event.

    Scale shape: one shuffle on the key feeds bounds, union, and
    window alike; grid size is (span/step) rows per key — choose
    ``step_ns`` so that stays sane (it is data, not state).
    """
    if step_ns <= 0:
        raise ValueError("step_ns must be positive")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).cast("long").alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(tiebreak_col).cast("long").alias("__id"),
    )
    step = F.lit(step_ns)
    # pure modular arithmetic: epoch-ns values exceed 2^53, so any
    # float division here would silently misplace ticks
    mn, mx = F.min("__t"), F.max("__t")
    bounds = ev.groupBy("__u").agg(
        (mn + (step - mn % step) % step).alias("__lo"),
        (mx - mx % step).alias("__hi"),
    ).filter(F.col("__lo") <= F.col("__hi"))
    grid = bounds.select(
        "__u",
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), step)
        ).alias("__t"),
    ).select(
        "__u",
        "__t",
        F.lit(None).cast("double").alias("__v"),
        F.lit(None).cast("long").alias("__id"),
        F.lit(1).alias("__is_grid"),
    )
    staged = ev.withColumn("__is_grid", F.lit(0)).unionByName(grid)
    w = (
        Window.partitionBy("__u")
        .orderBy(
            F.col("__t"),
            F.col("__is_grid"),
            F.coalesce(F.col("__id"), F.lit(-(1 << 62))),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = staged.withColumn(
        "__ffill", F.last("__v", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__is_grid") == 1)
        .select(
            F.col("__u").alias(user_col),
            F.col("__t").alias("tick_ns"),
            F.col("__ffill").alias("value_ffill"),
        )
        .orderBy(user_col, "tick_ns")
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    *,
    key_col: str = "user_id",
    fact_ts_col: str = "ts",
    valid_from_col: str = "valid_from",
    attr_col: str = "event_type",
    out_col: str = "state_at_event",
) -> DataFrame:
    """Temporal (point-in-time) dimension lookup: each fact row gets
    the ``dim_history`` attribute valid AT its timestamp (the row with
    the greatest ``valid_from`` ≤ fact ts; ``valid_from`` inclusive).
    The AS OF join every feature store / SCD2 warehouse needs — fed
    naturally by :func:`scd2_intervals`.

    Plan: the no-range-join carry pattern (same as the as-of family):
    union dim-change rows and fact rows on one timeline, ONE key
    shuffle, ``last(attr) IGNORE NULLS`` carries the state forward;
    dim rows sort before facts at equal timestamps so an effective-now
    change applies to same-instant facts. Never |facts| × |history|.
    """
    f = facts.select(
        F.col(key_col).alias("__k"),
        F.col(fact_ts_col).cast("long").alias("__t"),
        F.lit(None).cast("string").alias("__attr"),
        F.lit(1).alias("__is_fact"),
        "*",
    )
    d = dim_history.select(
        F.col(key_col).alias("__k"),
        F.col(valid_from_col).cast("long").alias("__t"),
        F.col(attr_col).cast("string").alias("__attr"),
        F.lit(0).alias("__is_fact"),
    )
    for c in facts.columns:
        d = d.withColumn(c, F.lit(None).cast(dict(f.dtypes)[c]))
    staged = f.unionByName(d)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_fact")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        staged.withColumn(
            out_col, F.last("__attr", ignorenulls=True).over(w)
        )
        .filter(F.col("__is_fact") == 1)
        .select(*facts.columns, out_col)
    )


def funnel_conversion_counts(
    events: DataFrame,
    steps: list,
    window_s: int,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-bound funnel: like :func:`funnel_counts`, but each step
    must occur within ``window_s`` SECONDS of the previously matched
    step, and a fresh occurrence of ``steps[0]`` re-anchors a stalled
    attempt (the product-analytics "conversion window" semantics).
    Counts each user's BEST depth across attempts.

    Exactness trick shared with the DuckDB oracle: the automaton state
    (depth, best, last-match-second) is packed into ONE BIGINT
    (``depth·2³⁶ + best·2³² + ts_s``) and each event into another
    (``code·2³² + ts_s``), so the whole per-user run is a fold over a
    sorted integer array — deterministic, engine-portable, and still
    a single codegen ``aggregate`` with one int of state per user.
    Second granularity bounds ts to 31 bits; funnel depths ≤ 15.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(steps) > 15:
        raise ValueError("at most 15 funnel steps (packed state)")
    if window_s <= 0:
        raise ValueError("window_s must be positive")
    p32, p36 = F.lit(1 << 32), F.lit(1 << 36)
    # code + second are pre-projected BEFORE the fold: `div` is true
    # integer division (double division of a ~2^60 ns timestamp is NOT
    # exact — the long→double cast already rounds), and the fold's own
    # power-of-two unpacking divisions are exact below 2^53
    code = F.lit(0).cast("long")
    for i, s in enumerate(steps):
        code = F.when(
            F.col(type_col) == F.lit(s), F.lit(i + 1).cast("long")
        ).otherwise(code)
    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        (code * p32 + F.expr(f"{ts_col} div 1000000000")).alias("__packed"),
    )
    per_user = prepped.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("__ts").alias("ts"),
                    F.col("__id").alias("id"),
                    F.col("__packed").alias("p"),
                )
            )
        ).alias("__tl")
    )
    packed = F.transform(F.col("__tl"), lambda e: e["p"])
    n = len(steps)
    w = F.lit(int(window_s))

    def _step(acc, x):
        d = (acc / p36).cast("long")
        b = ((acc / p32) % F.lit(16)).cast("long")
        t0 = acc % p32
        c = (x / p32).cast("long")
        te = x % p32
        advance = (
            (c == d + 1)
            & (d < F.lit(n))
            & ((d == 0) | (te - t0 <= w))
        )
        nd = F.when(advance, d + 1).otherwise(
            F.when(c == 1, F.lit(1).cast("long")).otherwise(d)
        )
        nt = F.when(advance | (c == 1), te).otherwise(t0)
        nb = F.greatest(b, nd)
        return nd * p36 + nb * p32 + nt

    best = (
        F.aggregate(packed, F.lit(0).cast("long"), _step) / p32
    ).cast("long") % F.lit(16)
    depths = per_user.select(best.alias("__best"))
    agg = depths.groupBy().agg(
        *[
            F.sum((F.col("__best") >= i + 1).cast("long")).alias(f"__n_{i}")
            for i in range(n)
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("step_idx"),
                        F.lit(s).alias("step"),
                        F.coalesce(F.col(f"__n_{i}"), F.lit(0)).alias(
                            "n_users"
                        ),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r")
    ).select("r.step_idx", "r.step", "r.n_users")
