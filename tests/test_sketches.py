"""Sketch invariants: HLL accuracy/merge, CMS bounds, plan shape.

The register-level values are pinned bit-exact by the oracle queries
(sketch_hll_registers / sketch_cms_counts etc.); these tests cover
what SQL can't — estimator accuracy against exact cardinalities, the
upper-bound contract, and the bounded-state plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.sketches import (
    cms_lookup,
    cms_table,
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from vector_indexer_spark.plans import audit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_hll_estimate_within_tolerance(spark, events):
    # standard error ~1.04/sqrt(m); p=12 -> 1.6%, allow 3 sigma + the
    # small-range correction regime
    exact = events.select("event_id").distinct().count()
    regs = hll_registers(events, "event_id", p=12)
    est = hll_estimate(regs, p=12)
    assert abs(est - exact) / exact < 0.05


def test_hll_low_cardinality_linear_counting(spark, events):
    # 15 distinct users at sf0.001 — deep in the linear-counting
    # regime, where the estimate is near-exact
    exact = events.select("user_id").distinct().count()
    regs = hll_registers(events, "user_id", p=12)
    est = hll_estimate(regs, p=12)
    assert abs(est - exact) / exact < 0.02


def test_hll_merge_equals_global(spark, events):
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(
        hll_registers(half_a, "event_id", p=10),
        hll_registers(half_b, "event_id", p=10),
    )
    whole = hll_registers(events, "event_id", p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_hll_state_bounded(spark, events):
    regs = hll_registers(events, "event_id", p=8)
    assert regs.count() <= 256


def test_hll_rejects_bad_p(events):
    with pytest.raises(ValueError):
        hll_registers(events, "event_id", p=3)


def test_cms_never_underestimates(spark, events):
    # the min-over-rows estimate is a provable upper bound on the
    # true count — check it for EVERY key, not just heavy ones
    sketch = cms_table(events, "user_id", depth=4, width=64)
    exact = events.groupBy("user_id").agg(
        F.count("*").alias("exact_count")
    )
    est = cms_lookup(sketch, exact, "user_id", depth=4, width=64)
    bad = (
        exact.join(est, "user_id")
        .filter(F.col("est_count") < F.col("exact_count"))
        .count()
    )
    assert bad == 0


def test_cms_tight_for_heavy_keys(spark, events):
    # with width >> distinct keys, collisions are rare and the top
    # keys' estimates should equal their exact counts
    hh = heavy_hitters(events, "user_id", k=5, depth=4, width=4096)
    rows = hh.collect()
    assert len(rows) == 5
    assert all(r["est_count"] == r["exact_count"] for r in rows)


def test_cms_merge_by_sum(spark, events):
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_table(half_a, "user_id", depth=2, width=64)
        .unionByName(cms_table(half_b, "user_id", depth=2, width=64))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_table(events, "user_id", depth=2, width=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_sketch_plans_single_shuffle(spark, events):
    # the whole sketch is one map-side-combinable aggregation over
    # the scan — the shape that makes it free at 100 TB
    s = audit.plan_summary(hll_registers(events, "event_id", p=10))
    assert s["shuffles"] <= 2  # agg exchange + orderBy range exchange
    assert not s["cartesian"]
    s2 = audit.plan_summary(cms_table(events, "user_id"))
    assert s2["shuffles"] <= 2
    assert not s2["cartesian"]


def test_streaming_hll_equals_batch(spark, tmp_path, events):
    # the streamed register table must be bit-identical to the batch
    # pass over the same files — and stay exact as more files arrive
    # (the MAX update is idempotent/associative, so replay is safe)
    from vector_indexer_spark.streaming.sketches import (
        start_hll_registers,
    )

    src = str(tmp_path / "src")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    half_a.write.parquet(src)

    schema = events.schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_hll_registers(
        stream,
        str(tmp_path / "ckpt"),
        col="event_id",
        p=10,
        queryName="t_hll",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got_a = sorted(
        map(tuple, spark.sql("SELECT * FROM t_hll").collect())
    )
    want_a = sorted(map(tuple, hll_registers(half_a, "event_id", p=10).collect()))
    assert got_a == want_a

    # second drop arrives; the restarted availableNow run must equal
    # the batch over the union
    half_b.write.mode("append").parquet(src)
    q2 = start_hll_registers(
        spark.readStream.schema(schema).parquet(src),
        str(tmp_path / "ckpt"),
        col="event_id",
        p=10,
        queryName="t_hll2",
        trigger_available_now=True,
    )
    q2.awaitTermination(120)
    got_all = sorted(
        map(tuple, spark.sql("SELECT * FROM t_hll2").collect())
    )
    want_all = sorted(
        map(tuple, hll_registers(events, "event_id", p=10).collect())
    )
    assert got_all == want_all


def test_grouped_hll_slices_equal_per_group_sketches(spark, events):
    from vector_indexer_spark.operators.sketches import hll_registers

    grouped = hll_registers(
        events, "user_id", p=8, group_cols=["event_type"]
    )
    types = [
        r[0] for r in events.select("event_type").distinct().collect()
    ]
    for t in types:
        slice_ = sorted(
            (r["register"], r["max_rho"])
            for r in grouped.filter(F.col("event_type") == t).collect()
        )
        direct = sorted(
            map(
                tuple,
                hll_registers(
                    events.filter(F.col("event_type") == t),
                    "user_id",
                    p=8,
                ).collect(),
            )
        )
        assert slice_ == direct


def test_bloom_no_false_negatives(spark, events):
    from vector_indexer_spark.operators.sketches import (
        bloom_bits,
        bloom_might_contain,
    )

    bits = bloom_bits(events, "user_id", m_bits=4096, k_hashes=4)
    present = events.select("user_id").distinct()
    got = bloom_might_contain(
        bits, present, "user_id", m_bits=4096, k_hashes=4
    ).collect()
    assert all(r["might_contain"] for r in got)


def test_bloom_rejects_most_absent_keys(spark, events):
    from vector_indexer_spark.operators.sketches import (
        bloom_bits,
        bloom_might_contain,
    )

    bits = bloom_bits(events, "user_id", m_bits=4096, k_hashes=4)
    absent = spark.range(1_000_000, 1_000_200).select(
        F.col("id").alias("user_id")
    )
    got = bloom_might_contain(
        bits, absent, "user_id", m_bits=4096, k_hashes=4
    ).collect()
    fp = sum(1 for r in got if r["might_contain"])
    # 15 distinct keys × 4 hashes in 4096 bits → fp rate ≪ 1%
    assert fp <= 2


def test_bloom_prefilter_exact_after_join(spark, events):
    from vector_indexer_spark.operators.sketches import bloom_prefilter

    small = events.filter(F.col("event_type") == "purchase").select(
        "user_id"
    ).distinct()
    pre = bloom_prefilter(
        events, small, "user_id", m_bits=4096, k_hashes=3
    )
    # no false negatives: the true semi-join survives the pre-filter
    want = events.join(small, "user_id", "left_semi").count()
    got = pre.join(small, "user_id", "left_semi").count()
    assert got == want
    assert pre.columns == events.columns


def test_bloom_contracts(spark, events):
    from vector_indexer_spark.operators.sketches import bloom_bits

    with pytest.raises(ValueError, match="m_bits"):
        bloom_bits(events, "user_id", m_bits=1)


def test_sketches_empty_input(spark):
    from vector_indexer_spark.operators.sketches import (
        bloom_bits,
        cms_table,
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "v long")
    regs = hll_registers(empty, "v", p=8)
    assert regs.count() == 0
    assert hll_estimate(regs, p=8) == 0.0
    assert cms_table(empty, "v").count() == 0
    assert bloom_bits(empty, "v").count() == 0


def test_profile_empty_table(spark):
    from vector_indexer_spark.operators.profile import profile_table

    empty = spark.createDataFrame([], "a long, b string")
    rows = {r["col_name"]: r for r in profile_table(empty).collect()}
    assert rows["a"]["n_nonnull"] == 0
    assert rows["a"]["n_null"] == 0
    assert rows["a"]["n_distinct"] == 0
    assert rows["a"]["min_repr"] is None


def test_hdr_quantiles_within_relative_error(spark, events):
    import numpy as np

    from vector_indexer_spark.operators.sketches import (
        hdr_histogram,
        hdr_quantiles,
    )

    hist = hdr_histogram(events, "value", scale=100, sub_bits=5)
    probs = [0.1, 0.5, 0.9, 0.99]
    est = hdr_quantiles(hist, probs, scale=100, sub_bits=5)
    vals = np.array(
        [r["value"] for r in events.select("value").collect()]
    )
    exact = np.quantile(np.floor(vals * 100) / 100, probs)
    for e_, x in zip(est, exact):
        # bucket width + rank interpolation: allow 2x the 2^-5 bound
        assert abs(e_ - x) <= max(abs(x) * 2 ** -4, 0.02)


def test_hdr_histogram_merge_and_bounds(spark, events):
    from vector_indexer_spark.operators.sketches import hdr_histogram

    a = hdr_histogram(
        events.filter(F.col("event_id") % 2 == 0), "value", sub_bits=4
    )
    b = hdr_histogram(
        events.filter(F.col("event_id") % 2 == 1), "value", sub_bits=4
    )
    merged = (
        a.unionByName(b)
        .groupBy("exp", "sub")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = hdr_histogram(events, "value", sub_bits=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # bounded state: every sub-bucket respects the 2^sub_bits cap
    import pytest as _p

    assert whole.filter(F.col("sub") >= 2 ** 5).count() == 0
    with _p.raises(ValueError, match="sub_bits"):
        hdr_histogram(events, "value", sub_bits=0)


def test_hdr_zero_and_empty(spark):
    from vector_indexer_spark.operators.sketches import (
        hdr_histogram,
        hdr_quantiles,
    )

    df = spark.createDataFrame(
        [(0.0,), (0.001,), (5.0,)], "value double"
    )
    hist = hdr_histogram(df, "value", scale=100, sub_bits=5)
    rows = {(r["exp"], r["sub"]): r["cnt"] for r in hist.collect()}
    # 0.0 and 0.001 both quantize to unit 0 → the (-1, 0) bucket
    assert rows[(-1, 0)] == 2
    empty = spark.createDataFrame([], "value double")
    import math

    est = hdr_quantiles(
        hdr_histogram(empty, "value"), [0.5]
    )
    assert math.isnan(est[0])


def test_streaming_cms_equals_batch(spark, tmp_path, events):
    from vector_indexer_spark.operators.sketches import cms_table
    from vector_indexer_spark.streaming.sketches import start_cms_table

    src = str(tmp_path / "cms_src")
    events.write.parquet(src)
    q = start_cms_table(
        spark.readStream.schema(events.schema).parquet(src),
        str(tmp_path / "cms_ckpt"),
        col="user_id",
        depth=2,
        width=64,
        queryName="t_cms",
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_cms").collect()))
    want = sorted(
        map(
            tuple,
            cms_table(events, "user_id", depth=2, width=64).collect(),
        )
    )
    assert got == want


def test_hll_trailing_merge_equals_direct_window_sketch(spark):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
        hll_trailing_merge,
    )

    # 3 daily slices of overlapping users
    rows = [(d, u) for d in range(3) for u in range(d * 50, d * 50 + 80)]
    df = spark.createDataFrame(rows, "day long, user long")
    per_day = hll_registers(df, "user", p=8, group_cols=["day"])
    trailing = hll_trailing_merge(per_day, bucket_col="day", trailing=2)
    # window anchored at day 1 covers days {0, 1}: must be REGISTER-
    # IDENTICAL to sketching those days' raw rows directly
    win1 = trailing.filter(F.col("day") == 1).select("register", "max_rho")
    direct = hll_registers(
        df.filter(F.col("day") <= 1), "user", p=8
    )
    assert sorted(map(tuple, win1.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # day 0's window is just day 0 (no phantom negative buckets), and
    # no window is anchored past the last real bucket
    anchors = sorted(
        r.day for r in trailing.select("day").distinct().collect()
    )
    assert anchors == [0, 1, 2]
    # estimates track the true distinct counts
    est = hll_estimate(win1, p=8)
    assert abs(est - 130) / 130 < 0.15


def test_cms_trailing_merge_equals_direct_window_sketch(spark):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.sketches import (
        cms_lookup,
        cms_table,
        cms_trailing_merge,
    )

    rows = [(d, f"k{(i + d) % 5}") for d in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "day long, k string")
    per_day = cms_table(df, "k", depth=2, width=32, group_cols=["day"])
    trailing = cms_trailing_merge(per_day, bucket_col="day", trailing=2)
    # window anchored at day 2 covers days {1, 2}: bucket-identical to
    # sketching those raw rows directly
    win = trailing.filter(F.col("day") == 2).select("d", "bucket", "cnt")
    direct = cms_table(
        df.filter(F.col("day") >= 1), "k", depth=2, width=32
    )
    assert sorted(map(tuple, win.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # lookups on the merged window never underestimate the true counts
    items = spark.createDataFrame([(f"k{i}",) for i in range(5)], "k string")
    est = {
        r.k: r.est_count
        for r in cms_lookup(win, items, "k", depth=2, width=32).collect()
    }
    from collections import Counter
    true = Counter(k for d, k in rows if d >= 1)
    for k, c in true.items():
        assert est[k] >= c
