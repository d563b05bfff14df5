"""Structured Streaming extensions: incremental ingest + windowed rollup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.index_build import build_index
from vector_indexer_spark.operators.search import search_index
from vector_indexer_spark.streaming.events import hourly_rollup
from vector_indexer_spark.streaming.ingest import start_vector_ingest

VECTOR_DDL = "id long, external_id long, values array<float>, ts long"


@pytest.fixture(scope="module")
def built(spark, embeddings, tmp_path_factory):
    vec = embeddings.select(
        F.col("vec_id").alias("id"),
        F.col("vec_id").alias("external_id"),
        F.col("embedding").alias("values"),
        F.lit(0).cast("long").alias("ts"),
    )
    path = str(tmp_path_factory.mktemp("stream") / "index")
    return build_index(vec, path, nlist=8, seed=42)


def test_incremental_ingest_lands_in_index(spark, built, tmp_path):
    # stream 50 new vectors (ids 10_000+) into the built index via a
    # file-source stream, then find them with a normal batch search
    rng = np.random.default_rng(5)
    new = [
        (
            10_000 + i,
            10_000 + i,
            (rng.normal(size=64) * 0.01 + built.centroids[i % built.nlist]).astype(
                np.float32
            ).tolist(),
            0,
        )
        for i in range(50)
    ]
    src = str(tmp_path / "incoming")
    spark.createDataFrame(new, VECTOR_DDL).write.parquet(src)

    stream = spark.readStream.schema(VECTOR_DDL).parquet(src)
    q = start_vector_ingest(
        built, stream, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)

    v = built.vectors(spark)
    assert v.count() == 500 + 50
    assert v.filter(F.col("id") >= 10_000).count() == 50

    # the streamed rows are now searchable: query one of them exactly
    target = new[7]
    qdf = spark.createDataFrame(
        [(0, target[2])], "query_id long, query array<float>"
    )
    hits = search_index(
        spark, built, qdf, k=1, n_probe=built.nlist
    ).collect()
    assert hits[0]["neighbor_id"] == target[0]
    assert hits[0]["dist2"] <= 1e-9


def test_hourly_rollup_batch_equals_sql(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    rows = [
        ("2024-01-01 10:05:00", "click", 1.5),
        ("2024-01-01 10:55:00", "click", 2.0),
        ("2024-01-01 11:05:00", "click", 4.0),
        ("2024-01-01 10:20:00", "view", 1.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double")
    df = df.select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = {
        (str(r.window_start), r.event_type): (r.n_events, r.value_sum_micros)
        for r in hourly_rollup(df).collect()
    }
    assert out[("2024-01-01 10:00:00", "click")] == (2, 3_500_000)
    assert out[("2024-01-01 11:00:00", "click")] == (1, 4_000_000)
    assert out[("2024-01-01 10:00:00", "view")] == (1, 1_000_000)


def test_hourly_rollup_streaming_with_watermark(spark, tmp_path):
    # run the same rollup as a real streaming query (availableNow) over
    # a file source and check the memory sink
    rows = [
        ("2024-01-01 10:05:00", "click", 1.5),
        ("2024-01-01 10:55:00", "click", 2.0),
        ("2024-01-01 11:05:00", "click", 4.0),
    ]
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double")
    df.select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    ).write.parquet(src)

    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(src)
    from vector_indexer_spark.streaming.events import start_hourly_rollup

    q = start_hourly_rollup(
        stream, str(tmp_path / "ckpt2"), queryName="t_rollup",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_rollup").collect()
    data = {(str(r.window_start), r.event_type): r.n_events for r in got}
    assert data.get(("2024-01-01 10:00:00", "click")) == 2
    assert data.get(("2024-01-01 11:00:00", "click")) == 1


def test_streaming_dedup_across_batches(spark, tmp_path):
    # stateful cross-batch dedup: duplicates in a LATER run (same
    # checkpoint) must be dropped by the state store
    from vector_indexer_spark.streaming.dedup import start_streaming_dedup

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    ddl = "doc_id long, text string"

    batch1 = [(0, "alpha"), (1, "beta"), (2, "alpha")]  # in-batch dup
    spark.createDataFrame(batch1, ddl).write.mode("append").parquet(src)
    stream = spark.readStream.schema(ddl).parquet(src)
    q = start_streaming_dedup(stream, out, ckpt, trigger_available_now=True)
    q.awaitTermination(120)

    got1 = {r.text: r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {"alpha": 0, "beta": 1}  # first occurrence kept

    # second run: cross-batch duplicates + one new doc
    batch2 = [(10, "alpha"), (11, "gamma"), (12, "beta")]
    spark.createDataFrame(batch2, ddl).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(ddl).parquet(src)
    q2 = start_streaming_dedup(stream2, out, ckpt, trigger_available_now=True)
    q2.awaitTermination(120)

    got2 = {r.text: r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {"alpha": 0, "beta": 1, "gamma": 11}


NS = 1_000_000_000


def _ev(eid, user, sec, value=1.0):
    return (eid, sec * NS, user, "click", value)


EV_DDL = "event_id long, ts long, user_id long, event_type string, value double"


def test_sessionize_gap_semantics(spark):
    from vector_indexer_spark.streaming.events import sessionize

    gap = 30 * 60  # 30 min in seconds
    rows = [
        _ev(0, 1, 0),            # session 1
        _ev(1, 1, 100),          # session 1 (gap 100s)
        _ev(2, 1, 100 + gap),    # session 1 — EXACTLY 30 min still merges
        _ev(3, 1, 100 + 3 * gap + 1),  # session 2 (gap = 30min + 1s)
        _ev(4, 2, 50),           # other user: own session numbering
    ]
    df = spark.createDataFrame(rows, EV_DDL)
    got = {
        (r.user_id, r.session_id): (
            r.session_start // NS,
            r.session_end // NS,
            r.n_events,
        )
        for r in sessionize(df).collect()
    }
    assert got[(1, 1)] == (0, 100 + gap, 3)
    assert got[(1, 2)] == (100 + 3 * gap + 1, 100 + 3 * gap + 1, 1)
    assert got[(2, 1)] == (50, 50, 1)


def test_sessionize_matches_native_session_window(spark):
    """The lag/cumsum formulation and Spark's session_window agree on
    (user, session_start, n_events) — including at the exact-gap
    boundary, where both MERGE (an event at prev + gap still joins the
    session; only a strictly greater gap starts a new one)."""
    import random

    from vector_indexer_spark.streaming.events import (
        session_rollup,
        sessionize,
    )

    rng = random.Random(11)
    rows = []
    eid = 0
    for user in range(20):
        t = rng.randrange(0, 3600)
        for _ in range(rng.randrange(1, 40)):
            # mix sub-gap and super-gap jumps, incl. exact-gap boundary
            t += rng.choice([10, 60, 1799, 1800, 1801, 5000])
            rows.append(_ev(eid, user, t, rng.random()))
            eid += 1
    df = spark.createDataFrame(rows, EV_DDL)
    a = {
        (r.user_id, r.session_start // NS): r.n_events
        for r in sessionize(df).collect()
    }
    tdf = df.withColumn(
        "ts", F.timestamp_seconds(F.col("ts") / NS)
    )
    b = {
        (r.user_id, int(r.session_start.timestamp())): r.n_events
        for r in session_rollup(tdf).collect()
    }
    assert a == b


def test_session_rollup_streaming(spark, tmp_path):
    from vector_indexer_spark.streaming.events import start_session_rollup

    rows = [
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 10:10:00", 1, 1.0),   # same session (gap 10m)
        ("2024-01-01 11:00:00", 1, 1.0),   # new session (gap 50m)
        ("2024-01-01 10:00:00", 2, 1.0),
    ]
    src = str(tmp_path / "sess_ev")
    df = spark.createDataFrame(rows, "ts_s string, user_id long, value double")
    df.select(
        F.to_timestamp("ts_s").alias("ts"), "user_id", "value"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(src)
    q = start_session_rollup(
        stream, str(tmp_path / "ckpt_sess"), queryName="t_sessions",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    assert got[(1, "2024-01-01 10:00:00")] == 2
    assert got[(1, "2024-01-01 11:00:00")] == 1
    assert got[(2, "2024-01-01 10:00:00")] == 1


def test_sliding_rollup_batch_overlap_semantics(spark):
    from vector_indexer_spark.streaming.events import sliding_rollup

    rows = [("2024-01-01 10:20:00", "click", 1.0)]
    ev = spark.createDataFrame(
        rows, "ts_s string, event_type string, value double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    got = sorted(
        (str(r.window_start), r.n_events)
        for r in sliding_rollup(ev).collect()
    )
    # one event at 10:20 lands in the 4 sliding 1h/15min windows
    # starting 09:30, 09:45, 10:00, 10:15
    assert got == [
        ("2024-01-01 09:30:00", 1),
        ("2024-01-01 09:45:00", 1),
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 10:15:00", 1),
    ]


def test_sliding_rollup_streaming(spark, tmp_path):
    from vector_indexer_spark.streaming.events import start_sliding_rollup

    rows = [
        ("2024-01-01 10:05:00", "click", 1.5),
        ("2024-01-01 10:20:00", "click", 2.0),
    ]
    src = str(tmp_path / "ev_slide")
    df = spark.createDataFrame(rows, "ts_s string, event_type string, value double")
    df.select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(src)
    q = start_sliding_rollup(
        stream, str(tmp_path / "ckpt_slide"), queryName="t_slide",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = {
        str(r.window_start): r.n_events
        for r in spark.sql("SELECT * FROM t_slide").collect()
    }
    # both events share windows 09:30..10:05? no: 10:05 windows start
    # 09:15,09:30,09:45,10:00; 10:20 start 09:30,09:45,10:00,10:15
    assert got["2024-01-01 09:15:00"] == 1
    assert got["2024-01-01 09:30:00"] == 2
    assert got["2024-01-01 10:00:00"] == 2
    assert got["2024-01-01 10:15:00"] == 1


# ---------------------------------------------------------------------------
# as-of join (carried-state window)
# ---------------------------------------------------------------------------

ASOF_DDL = "event_id long, user_id long, ts long, event_type string, value double"


def test_asof_attaches_latest_prior_click(spark):
    from vector_indexer_spark.streaming.events import asof_join_prior

    ev = spark.createDataFrame(
        [
            (1, 1, 100, "click", 1.0),
            (2, 1, 200, "click", 2.0),
            (3, 1, 300, "purchase", 9.0),   # -> click 2
            (4, 1, 400, "purchase", 9.0),   # -> still click 2
            (5, 2, 100, "purchase", 9.0),   # no prior click -> nulls
            (6, 2, 150, "click", 3.0),
            (7, 2, 150, "purchase", 9.0),   # tie on ts: click id 6 < 7 counts
        ],
        ASOF_DDL,
    )
    out = {
        r.event_id: r
        for r in asof_join_prior(
            ev, left_type="purchase", right_type="click"
        ).collect()
    }
    assert set(out) == {3, 4, 5, 7}
    assert out[3].prior_event_id == 2 and out[3].gap_ns == 100
    assert out[4].prior_event_id == 2 and out[4].gap_ns == 200
    assert out[5].prior_event_id is None and out[5].gap_ns is None
    assert out[7].prior_event_id == 6 and out[7].gap_ns == 0
    assert out[3].prior_value == 2.0


def test_asof_never_attaches_following_or_other_user(spark):
    from vector_indexer_spark.streaming.events import asof_join_prior

    ev = spark.createDataFrame(
        [
            (1, 1, 100, "purchase", 0.0),
            (2, 1, 200, "click", 1.0),     # after the purchase
            (3, 2, 50, "click", 1.0),      # other user
        ],
        ASOF_DDL,
    )
    rows = asof_join_prior(
        ev, left_type="purchase", right_type="click"
    ).collect()
    assert len(rows) == 1 and rows[0].prior_event_id is None


def test_props_rollup_typed_json_and_malformed(spark):
    from vector_indexer_spark.streaming.events import props_rollup

    ev = spark.createDataFrame(
        [
            (1, "click", '{"k": 10}'),
            (2, "click", '{"k": 5}'),
            (3, "click", "not json"),     # PERMISSIVE -> null k
            (4, "view", '{"other": 1}'),  # missing k -> null
        ],
        "event_id long, event_type string, props string",
    )
    out = {r.event_type: r for r in props_rollup(ev).collect()}
    assert out["click"].n_events == 3 and out["click"].n_with_k == 2
    assert out["click"].sum_k == 15
    assert out["click"].min_k == 5 and out["click"].max_k == 10
    assert out["view"].n_with_k == 0 and out["view"].sum_k == 0
    assert out["view"].min_k == -1


def test_streaming_asof_carries_state_across_batches(spark, tmp_path):
    # the carried right-type event must survive the micro-batch
    # boundary through the state store, and intra-batch ordering must
    # match the batch twin
    from vector_indexer_spark.streaming.asof import streaming_asof_prior

    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ckpt_asof")
    big = 2_000_000_000_000_000_000  # ns epoch beyond 2^53: exactness check

    def run(rows):
        spark.createDataFrame(rows, EV_DDL).write.mode("append").parquet(src)
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        q = (
            streaming_asof_prior(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.event_id: r for r in spark.read.parquet(out).collect()
        }

    # batch 1: click then purchase (intra-batch), purchase with no click
    got = run(
        [
            (1, big + 100, 1, "click", 2.5),
            (2, big + 200, 1, "purchase", 9.0),
            (3, big + 50, 2, "purchase", 9.0),
        ]
    )
    assert got[2].prior_event_id == 1 and got[2].gap_ns == 100
    assert got[2].prior_value == 2.5
    assert got[3].prior_event_id is None

    # batch 2: purchase only — must attach batch 1's click via state
    got = run([(4, big + 900, 1, "purchase", 9.0)])
    assert got[4].prior_event_id == 1 and got[4].gap_ns == 800


def test_streaming_asof_matches_batch_twin_on_ordered_input(spark, tmp_path):
    from vector_indexer_spark.streaming.asof import streaming_asof_prior
    from vector_indexer_spark.streaming.events import asof_join_prior

    rows = []
    eid = 0
    for user in (1, 2, 3):
        for step in range(12):
            eid += 1
            etype = "click" if (step * 7 + user) % 3 else "purchase"
            rows.append((eid, (step * 60 + user) * NS, user, etype, float(step)))

    src = str(tmp_path / "ev2_in")
    out = str(tmp_path / "ev2_out")
    spark.createDataFrame(rows, EV_DDL).write.parquet(src)
    stream = spark.readStream.schema(EV_DDL).parquet(src)
    q = (
        streaming_asof_prior(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: (r.prior_event_id, r.gap_ns)
        for r in spark.read.parquet(out).collect()
    }
    batch = asof_join_prior(
        spark.createDataFrame(rows, EV_DDL),
        left_type="purchase",
        right_type="click",
    )
    want = {
        r.event_id: (r.prior_event_id, r.gap_ns) for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_interval_join_band_semantics(spark):
    from vector_indexer_spark.streaming.events import interval_join

    H = 3_600_000_000_000
    clicks = spark.createDataFrame([(1, 0, 1, "click", 0.0)], EV_DDL)
    buys = spark.createDataFrame(
        [
            (2, 1, 1, "purchase", 0.0),        # +1ns: in
            (3, H, 1, "purchase", 0.0),        # exactly +1h: in (closed end)
            (4, H + 1, 1, "purchase", 0.0),    # beyond: out
            (5, 0, 1, "purchase", 0.0),        # simultaneous: out (strict)
            (6, 10, 2, "purchase", 0.0),       # other user: out
        ],
        EV_DDL,
    )
    got = {
        r.right_id: r.delta_ns
        for r in interval_join(clicks, buys).collect()
    }
    assert got == {2: 1, 3: H}


def test_streaming_interval_join_bounded_state(spark, tmp_path):
    from vector_indexer_spark.streaming.events import streaming_interval_join

    ddl = "event_id long, user_id long, sec long"
    src_l = str(tmp_path / "clicks")
    src_r = str(tmp_path / "buys")
    out = str(tmp_path / "paired")
    spark.createDataFrame(
        [(1, 1, 100), (2, 2, 100)], ddl
    ).write.parquet(src_l)
    spark.createDataFrame(
        [(10, 1, 100 + 1800), (11, 1, 100 + 7200), (12, 2, 150)], ddl
    ).write.parquet(src_r)

    def ts(df):
        return df.select(
            "event_id", "user_id",
            F.timestamp_seconds(F.col("sec")).alias("ts"),
        )

    joined = streaming_interval_join(
        ts(spark.readStream.schema(ddl).parquet(src_l)),
        ts(spark.readStream.schema(ddl).parquet(src_r)),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.left_id, r.right_id)
        for r in spark.read.parquet(out).collect()
    }
    # click 1 pairs with the 30-min purchase, not the 2h one;
    # user 2 pairs within the window
    assert got == {(1, 10), (2, 12)}


def test_rolling_anomalies_flags_spike(spark):
    from vector_indexer_spark.streaming.events import rolling_anomalies

    # 30 calm hours at value 10, then one 100x spike
    H = 3_600_000_000_000
    rows = []
    for h in range(31):
        v = 1000.0 if h == 30 else 10.0
        rows.append((h, h * H, 1, "click", v))
    ev = spark.createDataFrame(rows, EV_DDL)
    out = {
        r.hour_start // H: r.is_anomaly
        for r in rolling_anomalies(ev).collect()
    }
    # the trailing window is full from hour 24 on
    assert out[30] is True
    assert all(not out[h] for h in out if h != 30)
    # calm-only series: zero variance and zero deviation -> not anomalous
    calm = spark.createDataFrame(rows[:30], EV_DDL)
    assert all(not r.is_anomaly for r in rolling_anomalies(calm).collect())


def test_rolling_anomalies_validation(spark):
    from vector_indexer_spark.streaming.events import rolling_anomalies

    ev = spark.createDataFrame([], EV_DDL)
    with pytest.raises(ValueError):
        rolling_anomalies(ev, window_buckets=1)


def test_funnel_greedy_subsequence(spark):
    from vector_indexer_spark.streaming.events import funnel_counts

    rows = [
        # user 1: full funnel with interleaved noise
        (1, 10 * NS, 1, "click", 0.0),
        (2, 20 * NS, 1, "error", 0.0),
        (3, 30 * NS, 1, "view", 0.0),
        (4, 40 * NS, 1, "purchase", 0.0),
        # user 2: view BEFORE click -> depth stops at click
        (5, 10 * NS, 2, "view", 0.0),
        (6, 20 * NS, 2, "click", 0.0),
        # user 3: never clicks
        (7, 10 * NS, 3, "purchase", 0.0),
    ]
    ev = spark.createDataFrame(rows, EV_DDL)
    out = {
        r.step_idx: r.n_users
        for r in funnel_counts(ev, ["click", "view", "purchase"]).collect()
    }
    assert out == {0: 2, 1: 1, 2: 1}
    with pytest.raises(ValueError):
        funnel_counts(ev, [])


def test_retention_cohorts_offsets(spark):
    from vector_indexer_spark.streaming.events import retention_cohorts

    W = 7 * 24 * 3600
    rows = [
        # user 1: weeks 0, 1, 3; user 2: week 0 only; user 3: week 1
        (1, 1 * NS, 1, "click", 0.0),
        (2, (W + 5) * NS, 1, "click", 0.0),
        (3, (3 * W + 5) * NS, 1, "click", 0.0),
        (4, 2 * NS, 2, "click", 0.0),
        (5, (W + 9) * NS, 3, "click", 0.0),
    ]
    ev = spark.createDataFrame(rows, EV_DDL)
    out = {
        (r.cohort_bucket // (W * NS), r.bucket_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert out == {
        (0, 0): 2,  # users 1, 2 start week 0
        (0, 1): 1,  # user 1 back in week 1
        (0, 3): 1,  # user 1 back in week 3
        (1, 0): 1,  # user 3 starts week 1
    }


def test_transition_counts_pairs(spark):
    from vector_indexer_spark.streaming.events import transition_counts

    rows = [
        (1, 10 * NS, 1, "click", 0.0),
        (2, 20 * NS, 1, "view", 0.0),
        (3, 30 * NS, 1, "click", 0.0),
        (4, 10 * NS, 2, "click", 0.0),   # user boundary: no cross-pair
        (5, 20 * NS, 2, "view", 0.0),
    ]
    ev = spark.createDataFrame(rows, EV_DDL)
    got = {
        (r.from_type, r.to_type): r.n_transitions
        for r in transition_counts(ev).collect()
    }
    assert got == {("click", "view"): 2, ("view", "click"): 1}


def test_active_users_dau_wau(spark):
    from vector_indexer_spark.streaming.events import active_users

    D = 24 * 3600
    rows = [
        # day 0: users 1, 2; day 1: user 1; day 8: user 3 (outside
        # 7-day window of day 0/1)
        (1, 1 * NS, 1, "click", 0.0),
        (2, 2 * NS, 2, "click", 0.0),
        (3, 3 * NS, 1, "click", 0.0),   # same day dup: DAU counts once
        (4, (D + 5) * NS, 1, "click", 0.0),
        (5, (8 * D + 5) * NS, 3, "click", 0.0),
    ]
    ev = spark.createDataFrame(rows, EV_DDL)
    out = {
        r.day_bucket // (D * NS): (r.dau, r.wau)
        for r in active_users(ev).collect()
    }
    # day 0: dau 2 (users 1,2), wau 2
    # day 1: dau 1, wau 2 (users 1,2 still inside the trailing week)
    # day 8: dau 1, wau 1 — window [day 2, day 8] holds only user 3
    assert out[0] == (2, 2)
    assert out[1] == (1, 2)
    assert out[8] == (1, 1)
    with pytest.raises(ValueError):
        active_users(ev, window_days=0)


def test_asof_next_attaches_earliest_later_purchase(spark):
    from vector_indexer_spark.streaming.events import asof_join_next

    rows = [
        # user 1: click@10 -> purchases @20, @30 (earliest=20);
        # click@25 -> purchase@30; click@40 -> none
        (1, 10, 1, "click", 0.0),
        (2, 20, 1, "purchase", 5.0),
        (3, 30, 1, "purchase", 7.0),
        (4, 25, 1, "click", 0.0),
        (5, 40, 1, "click", 0.0),
        # user 2: tie on ts — purchase counts as later iff id larger
        (6, 50, 2, "click", 0.0),
        (7, 50, 2, "purchase", 9.0),
        (8, 50, 2, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    out = {
        r.event_id: r
        for r in asof_join_next(
            ev, left_type="click", right_type="purchase"
        ).collect()
    }
    assert out[1].next_event_id == 2 and out[1].gap_ns == 10
    assert out[4].next_event_id == 3 and out[4].gap_ns == 5
    assert out[5].next_event_id is None and out[5].gap_ns is None
    # ties: (50, id 7) and (50, id 8) are both "later" than (50, id 6);
    # the earliest by (ts, id) is id 7
    assert out[6].next_event_id == 7


def test_streaming_asof_next_waits_for_future_match(spark, tmp_path):
    """Forward as-of as a stream: a click waits in state until its
    purchase arrives in a LATER micro-batch, then emits exactly once;
    intra-batch matching follows (ts, id) order like the batch twin."""
    from vector_indexer_spark.streaming.asof import streaming_asof_next

    src = str(tmp_path / "nev_in")
    out = str(tmp_path / "nev_out")
    ckpt = str(tmp_path / "ckpt_asof_next")
    big = 2_000_000_000_000_000_000

    def run(rows):
        spark.createDataFrame(rows, EV_DDL).write.mode("append").parquet(src)
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        q = (
            streaming_asof_next(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.event_id: r for r in spark.read.parquet(out).collect()}

    # batch 1: click→purchase intra-batch; two clicks left pending
    got = run(
        [
            (1, big + 100, 1, "click", 0.0),
            (2, big + 200, 1, "purchase", 9.0),
            (3, big + 300, 1, "click", 0.0),
            (4, big + 50, 2, "click", 0.0),
        ]
    )
    assert got[1].next_event_id == 2 and got[1].gap_ns == 100
    assert got[1].next_value == 9.0
    assert 3 not in got and 4 not in got  # pending, not emitted

    # batch 2: purchases release both pending clicks (cross-batch);
    # two pending lefts may match the same right's user timeline
    got = run(
        [
            (5, big + 900, 1, "purchase", 7.0),
            (6, big + 60, 2, "purchase", 3.0),
        ]
    )
    assert got[3].next_event_id == 5 and got[3].gap_ns == 600
    assert got[4].next_event_id == 6 and got[4].gap_ns == 10
    # already-emitted click 1 did not re-emit with the new purchase
    assert got[1].next_event_id == 2


def test_streaming_asof_next_multiple_lefts_one_right(spark, tmp_path):
    from vector_indexer_spark.streaming.asof import streaming_asof_next

    src = str(tmp_path / "mev_in")
    out = str(tmp_path / "mev_out")
    ckpt = str(tmp_path / "ckpt_asof_multi")

    spark.createDataFrame(
        [
            (1, 100, 1, "click", 0.0),
            (2, 200, 1, "click", 0.0),
            (3, 300, 1, "purchase", 5.0),
            # tie on ts with the purchase: click 9's id is larger than
            # the purchase's, so the purchase is NOT later for it —
            # click 9 stays pending
            (9, 300, 1, "click", 0.0),
        ],
        EV_DDL,
    ).write.parquet(src)
    stream = spark.readStream.schema(EV_DDL).parquet(src)
    q = (
        streaming_asof_next(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    assert got[1].next_event_id == 3 and got[2].next_event_id == 3
    assert 9 not in got


def test_pivot_counts_explicit_values(spark):
    from vector_indexer_spark.streaming.events import pivot_counts

    rows = [
        (1, "click"), (1, "click"), (1, "buy"), (2, "buy"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["user_id"]: r
        for r in pivot_counts(
            ev, pivot_values=["click", "buy", "view"]
        ).collect()
    }
    assert (got[1]["n_click"], got[1]["n_buy"], got[1]["n_view"]) == (2, 1, 0)
    assert (got[2]["n_click"], got[2]["n_buy"]) == (0, 1)
    with pytest.raises(ValueError, match="pivot_values"):
        pivot_counts(ev, pivot_values=[])


def test_latest_by_key_tiebreak_and_group_limit_plan(spark):
    from vector_indexer_spark.plans import audit
    from vector_indexer_spark.streaming.events import latest_by_key

    rows = [
        (10, 100, 1, "a"),
        (11, 100, 1, "b"),   # same ts → higher event_id wins
        (5, 200, 1, "c"),    # later ts wins outright... (ts=200)
        (7, 50, 2, "d"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    got = {r["user_id"]: r for r in latest_by_key(ev).collect()}
    assert got[1]["event_type"] == "c"
    assert got[2]["event_type"] == "d"
    # same-ts tie: drop the ts=200 row and the event_id breaks it
    got2 = {
        r["user_id"]: r
        for r in latest_by_key(ev.filter("ts != 200")).collect()
    }
    assert got2[1]["event_id"] == 11
    # partial window-group-limit below the exchange: map tasks forward
    # one candidate per key, not full history
    plan = audit.executed_plan(latest_by_key(ev))
    assert "WindowGroupLimit" in plan


def test_scd2_intervals_islands_merge(spark):
    from vector_indexer_spark.streaming.events import scd2_intervals

    rows = [
        (1, 100, 1, "free"),
        (2, 200, 1, "free"),   # same attr — merges into one interval
        (3, 300, 1, "paid"),
        (4, 400, 1, "free"),   # back to free — NEW interval, not merged
        (5, 100, 2, "paid"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string"
    )
    got = scd2_intervals(ev).collect()
    u1 = [
        (r["event_type"], r["valid_from"], r["valid_to"])
        for r in got
        if r["user_id"] == 1
    ]
    assert u1 == [
        ("free", 100, 300),
        ("paid", 300, 400),
        ("free", 400, None),
    ]
    u2 = [(r["event_type"], r["valid_to"]) for r in got if r["user_id"] == 2]
    assert u2 == [("paid", None)]


def test_resample_ffill_hand_case(spark):
    from vector_indexer_spark.streaming.events import resample_ffill

    # user 1: events at t=5 (v=10) and t=25 (v=20), step 10
    # → ticks 10 (sees v=10) and 20 (still v=10); no tick at 25
    # wait: hi = 25 - 25%10 = 20, lo = 5 + (10 - 5)%10 = 10
    rows = [
        (1, 5, 10.0, 100),
        (1, 25, 20.0, 101),
        (2, 10, 7.0, 102),   # single on-grid event: tick 10 sees it
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, value double, event_id long"
    )
    got = sorted(
        (r["user_id"], r["tick_ns"], r["value_ffill"])
        for r in resample_ffill(ev, step_ns=10).collect()
    )
    assert got == [(1, 10, 10.0), (1, 20, 10.0), (2, 10, 7.0)]


def test_resample_ffill_same_ts_tiebreak_and_contract(spark):
    from vector_indexer_spark.streaming.events import resample_ffill

    # two events at the same timestamp: the higher event_id wins
    rows = [(1, 10, 1.0, 100), (1, 10, 2.0, 101)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, value double, event_id long"
    )
    got = resample_ffill(ev, step_ns=10).collect()
    assert [(r["tick_ns"], r["value_ffill"]) for r in got] == [(10, 2.0)]
    with pytest.raises(ValueError, match="step_ns"):
        resample_ffill(ev, step_ns=0)


def test_correlation_matrix_reference(spark):
    import numpy as np

    from vector_indexer_spark.operators.profile import correlation_matrix

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1000, 200) / 10.0
    y = 2.0 * x + rng.integers(0, 100, 200) / 10.0
    z = rng.integers(0, 1000, 200) / 10.0
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["x", "y", "z"], scale=10).collect()
    }
    # quantization at scale=10 is lossless for these /10 values → the
    # result must match numpy's corrcoef on the quantized ints
    qx, qy, qz = (np.floor(v * 10).astype(np.int64) for v in (x, y, z))
    assert abs(got[("x", "y")] - np.corrcoef(qx, qy)[0, 1]) < 1e-12
    assert abs(got[("x", "z")] - np.corrcoef(qx, qz)[0, 1]) < 1e-12
    assert got[("x", "y")] > 0.9
    import pytest as _p

    with _p.raises(ValueError, match="at least 2"):
        correlation_matrix(df, ["x"])


def test_correlation_constant_column_null(spark):
    from vector_indexer_spark.operators.profile import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
    )
    got = correlation_matrix(df, ["c", "x"]).collect()
    assert got[0]["corr"] is None  # zero variance → NULL, not NaN/crash


def test_streaming_latest_state_equals_batch(spark, tmp_path):
    from vector_indexer_spark.sources.files import read_events_ns
    from vector_indexer_spark.streaming.cdc import start_latest_state
    from vector_indexer_spark.streaming.events import latest_by_key

    ev = read_events_ns(
        spark, "/root/testdata/sf0.001/events.parquet"
    ).cache()
    src = str(tmp_path / "src")
    first = ev.filter(F.col("event_id") % 3 != 0)
    rest = ev.filter(F.col("event_id") % 3 == 0)
    first.write.parquet(src)

    schema = ev.schema
    q = start_latest_state(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "ckpt"),
        queryName="t_state",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql(
            "SELECT user_id, event_id, ts FROM t_state"
        ).collect())
    )
    want = sorted(
        map(
            tuple,
            latest_by_key(first).select(
                "user_id", "event_id", "ts"
            ).collect(),
        )
    )
    assert got == want

    # late batch arrives: restart over the grown directory — the
    # compacted state must equal the batch answer over everything
    rest.write.mode("append").parquet(src)
    q2 = start_latest_state(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "ckpt"),
        queryName="t_state2",
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    got2 = sorted(
        map(tuple, spark.sql(
            "SELECT user_id, event_id, ts FROM t_state2"
        ).collect())
    )
    want2 = sorted(
        map(
            tuple,
            latest_by_key(ev).select(
                "user_id", "event_id", "ts"
            ).collect(),
        )
    )
    assert got2 == want2


def test_point_in_time_join_semantics(spark):
    from vector_indexer_spark.streaming.events import point_in_time_join

    dim = spark.createDataFrame(
        [(1, 100, "bronze"), (1, 200, "gold"), (2, 50, "bronze")],
        "user_id long, valid_from long, event_type string",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, 150),  # between changes → bronze
            (11, 1, 200),  # AT the change instant → inclusive → gold
            (12, 1, 999),  # after → gold
            (13, 2, 40),   # before any history → NULL
            (14, 3, 500),  # no history at all → NULL
        ],
        "event_id long, user_id long, ts long",
    )
    got = {
        r["event_id"]: r["state_at_event"]
        for r in point_in_time_join(facts, dim).collect()
    }
    assert got == {
        10: "bronze",
        11: "gold",
        12: "gold",
        13: None,
        14: None,
    }


def test_point_in_time_join_single_shuffle(spark):
    from vector_indexer_spark.plans import audit
    from vector_indexer_spark.streaming.events import point_in_time_join

    dim = spark.createDataFrame(
        [(1, 100, "a")], "user_id long, valid_from long, event_type string"
    )
    facts = spark.createDataFrame(
        [(10, 1, 150)], "event_id long, user_id long, ts long"
    )
    s = audit.plan_summary(point_in_time_join(facts, dim))
    # union + ONE key-partitioned window — never |facts| x |history|
    assert s["shuffles"] <= 2  # key exchange (+ final orderBy-free here)
    assert not s["cartesian"]


def test_streaming_lsh_candidates_match_batch(spark, tmp_path, documents):
    """The live LSH matcher over micro-batches must find exactly the
    candidate pairs the batch operator finds — scan-local HOF
    signatures ≡ the explode+window batch signatures, and keyed bucket
    state ≡ the banded self-join."""
    from vector_indexer_spark.operators.dedup import lsh_candidate_pairs
    from vector_indexer_spark.streaming.dedup import streaming_lsh_candidates

    docs = documents.filter(F.col("doc_id") < 30).select("doc_id", "text")
    again = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    ddl = "doc_id long, text string"

    src = str(tmp_path / "lsh_in")
    out = str(tmp_path / "lsh_out")
    ckpt = str(tmp_path / "lsh_ckpt")

    def _run():
        stream = spark.readStream.schema(ddl).parquet(src)
        q = (
            streaming_lsh_candidates(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 = originals, batch 2 = duplicates (cross-batch pairs)
    docs.write.mode("append").parquet(src)
    _run()
    again.write.mode("append").parquet(src)
    _run()

    live = spark.read.parquet(out).collect()
    live_pairs = {
        (min(r.new_id, r.prior_id), max(r.new_id, r.prior_id)) for r in live
    }
    batch_pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(docs.unionByName(again)).collect()
    }
    assert live_pairs == batch_pairs
    # identical texts must pair across the batch boundary
    for i in range(30):
        assert (i, i + 10_000) in live_pairs


def test_streaming_lsh_bucket_saturation_bounds_state(spark, tmp_path):
    """A boilerplate bucket saturates at max_bucket_size: pairing and
    state growth stop, so a 10⁸-copy footer cannot blow up either the
    state store or the emission volume."""
    from vector_indexer_spark.streaming.dedup import streaming_lsh_candidates

    boiler = "the same boilerplate footer text repeated verbatim"
    rows = [(i, boiler) for i in range(20)]
    ddl = "doc_id long, text string"
    src = str(tmp_path / "sat_in")
    ckpt = str(tmp_path / "sat_ckpt")
    spark.createDataFrame(rows, ddl).write.parquet(src)
    stream = spark.readStream.schema(ddl).parquet(src)
    q = (
        streaming_lsh_candidates(stream, max_bucket_size=5)
        .writeStream.format("memory")
        .queryName("lsh_sat")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM lsh_sat").collect()
    # per band: members 0..4 pair (5*4/2 = 10 pairs), the rest are
    # suppressed; 4 bands of identical signatures → 40 rows
    assert len(out) == 40
    assert {(r.new_id, r.prior_id) for r in out} == {
        (b, a) for a in range(5) for b in range(a + 1, 5)
    }


def test_funnel_conversion_window_and_restart(spark):
    from vector_indexer_spark.streaming.events import (
        funnel_conversion_counts,
        funnel_counts,
    )

    rows = [
        # user 1: full funnel within windows
        _ev(0, 1, 0, 1.0), (1, 10 * NS, 1, "cart", 1.0),
        (2, 20 * NS, 1, "buy", 1.0),
        # user 2: first cart too late, restart succeeds
        (3, 0 * NS, 2, "click", 1.0), (4, 100 * NS, 2, "cart", 1.0),
        (5, 110 * NS, 2, "click", 1.0), (6, 120 * NS, 2, "cart", 1.0),
        (7, 130 * NS, 2, "buy", 1.0),
        # user 3: stalls at cart — buy outside the window, no restart
        (8, 0 * NS, 3, "click", 1.0), (9, 10 * NS, 3, "cart", 1.0),
        (10, 200 * NS, 3, "buy", 1.0),
    ]
    df = spark.createDataFrame(rows, EV_DDL)
    got = {
        r.step_idx: r.n_users
        for r in funnel_conversion_counts(
            df, ["click", "cart", "buy"], 30
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 2}
    # the unbounded funnel counts user 3's late buy as converted
    unbounded = {
        r.step_idx: r.n_users
        for r in funnel_counts(df, ["click", "cart", "buy"]).collect()
    }
    assert unbounded == {0: 3, 1: 3, 2: 3}


def test_funnel_conversion_validation(spark):
    import pytest as _pytest

    from vector_indexer_spark.streaming.events import (
        funnel_conversion_counts,
    )

    df = spark.createDataFrame([_ev(0, 1, 0)], EV_DDL)
    with _pytest.raises(ValueError):
        funnel_conversion_counts(df, [], 10)
    with _pytest.raises(ValueError):
        funnel_conversion_counts(df, ["a"], 0)
    with _pytest.raises(ValueError):
        funnel_conversion_counts(df, [str(i) for i in range(16)], 10)


def test_cleaning_pass_composes_with_streaming(spark, tmp_path, documents):
    """The corpus-cleaning scan (stats + Gopher rules) is scan-local,
    so it must run unchanged as a Structured Streaming query — the
    'clean as it lands' deployment. availableNow file source, parquet
    sink; results must equal the batch run row-for-row."""
    from vector_indexer_spark.operators.text_analysis import (
        gopher_quality,
        text_stats,
    )

    docs = documents.limit(100).select("doc_id", "text")
    src = str(tmp_path / "clean_in")
    out = str(tmp_path / "clean_out")
    ckpt = str(tmp_path / "clean_ckpt")
    docs.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        gopher_quality(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        r.doc_id: (r.n_words, r.passes)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: (r.n_words, r.passes)
        for r in gopher_quality(docs).collect()
    }
    assert streamed == batch
    # and the stats scan too (stats feed quality_filter pipelines)
    sq = (
        text_stats(spark.readStream.schema("doc_id long, text string")
                   .parquet(src))
        .writeStream.format("memory")
        .queryName("stats_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM stats_live").collect()[0].c == 100


def test_versioned_sink_commits_per_batch(spark, tmp_path):
    from vector_indexer_spark.operators import maintenance as mt
    from vector_indexer_spark.streaming.cdc import start_versioned_sink

    src = str(tmp_path / "vs_in")
    tdir = str(tmp_path / "vs_table")
    ckpt = str(tmp_path / "vs_ckpt")
    ddl = "doc_id long, text string"

    spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], ddl
    ).write.mode("append").parquet(src)
    q = start_versioned_sink(
        spark.readStream.schema(ddl).parquet(src), tdir, ckpt,
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    v1 = mt.latest_version(tdir)
    assert v1 >= 1
    assert mt.read_version(spark, tdir, 1).count() == 2

    # second run, new data -> a NEW version; old one immutable
    spark.createDataFrame([(2, "gamma")], ddl).write.mode(
        "append"
    ).parquet(src)
    q2 = start_versioned_sink(
        spark.readStream.schema(ddl).parquet(src), tdir, ckpt,
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    v2 = mt.latest_version(tdir)
    assert v2 == v1 + 1
    assert mt.read_version(spark, tdir, v2).count() == 1  # the delta
    assert mt.read_version(spark, tdir, 1).count() == 2   # unchanged
    hist = mt.history(tdir)
    assert all(h["note"].startswith("stream-epoch-") for h in hist)


def test_streaming_dedup_vs_manifest_matches_batch(spark, tmp_path):
    """Stream-static anti-join vs the corpus manifest + in-stream
    state must keep exactly what the batch incremental op keeps."""
    from vector_indexer_spark.operators.dedup import (
        content_hash_manifest,
        dedup_incremental_exact,
    )
    from vector_indexer_spark.streaming.dedup import (
        streaming_dedup_vs_manifest,
    )

    ddl = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], ddl
    )
    manifest = content_hash_manifest(corpus)
    delta = [
        (10, "alpha"),      # corpus dup -> dropped by the anti-join
        (11, "gamma"),      # fresh -> kept
        (12, "gamma"),      # in-batch dup -> dropped by state
        (13, "delta"),      # fresh -> kept
    ]
    src = str(tmp_path / "vm_in")
    out = str(tmp_path / "vm_out")
    ckpt = str(tmp_path / "vm_ckpt")
    spark.createDataFrame(delta, ddl).write.parquet(src)
    q = (
        streaming_dedup_vs_manifest(
            spark.readStream.schema(ddl).parquet(src), manifest
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    batch = sorted(
        r.doc_id
        for r in dedup_incremental_exact(
            spark.createDataFrame(delta, ddl), manifest
        ).collect()
    )
    assert streamed == batch == [11, 13]


def test_streaming_posting_append_matches_batch_manifest(spark, tmp_path):
    """Two micro-batched document files streamed through the posting-
    append sink must yield a manifest identical (as a multiset) to the
    batch sparse_manifest over the union, and searching it must equal
    the batch tokens path exactly."""
    from vector_indexer_spark.operators.sparse import (
        sparse_manifest,
        sparse_search_manifest,
        sparse_search_tokens,
    )
    from vector_indexer_spark.streaming.sparse import start_posting_append

    ddl = "doc_id long, text string"
    rows = [
        (i, f"alpha w{i % 7} w{i % 13} beta w{i % 7}") for i in range(60)
    ]
    src = str(tmp_path / "docs_in")
    # two files -> (at least) two micro-batches through maxFilesPerTrigger
    spark.createDataFrame(rows[:30], ddl).write.parquet(src)
    spark.createDataFrame(rows[30:], ddl).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    mpath = str(tmp_path / "postings")
    q = start_posting_append(
        stream, mpath, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)

    docs = spark.createDataFrame(rows, ddl)
    streamed = spark.read.parquet(mpath).select("id", "term", "tf")
    batch = sparse_manifest(docs)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )

    qdf = docs.filter(F.col("doc_id") < 3)
    a = sparse_search_manifest(
        spark.read.parquet(mpath), qdf, k=5, query_id_col="doc_id",
        weighting="bm25",
    ).collect()
    b = sparse_search_tokens(
        docs, qdf, k=5, query_id_col="doc_id", weighting="bm25"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
