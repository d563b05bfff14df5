"""Profiler invariants beyond the oracled events profile: float and
default-column handling, approx mode, error contract, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.profile import profile_table
from vector_indexer_spark.plans import audit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_profile_all_columns_default(spark, events):
    prof = profile_table(events)
    rows = {r["col_name"]: r for r in prof.collect()}
    assert set(rows) == set(events.columns)
    # float column: counts are real, min/max repr suppressed
    v = rows["value"]
    assert v["dtype"] == "double"
    assert v["min_repr"] is None and v["max_repr"] is None
    assert v["n_nonnull"] + v["n_null"] == events.count()
    # key column: distinct equals exact distinct
    assert (
        rows["event_id"]["n_distinct"]
        == events.select("event_id").distinct().count()
    )


def test_profile_min_max_match_exact(spark, events):
    rows = {
        r["col_name"]: r
        for r in profile_table(events, ["event_id", "event_type"]).collect()
    }
    lo, hi = events.agg(
        F.min("event_id"), F.max("event_id")
    ).first()
    assert rows["event_id"]["min_repr"] == str(lo)
    assert rows["event_id"]["max_repr"] == str(hi)


def test_profile_approx_mode_close(spark, events):
    prof = profile_table(events, ["event_id"], distinct="approx")
    est = prof.first()["n_distinct"]
    exact = events.select("event_id").distinct().count()
    assert abs(est - exact) / exact < 0.1


def test_profile_error_contracts(events):
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(events, ["nope"])
    with pytest.raises(ValueError, match="exact|approx"):
        profile_table(events, distinct="bogus")


def test_profile_single_pass_plan(spark, events):
    # one aggregation over one scan — never a per-column job; the
    # expand for multi-distinct stays inside the single shuffle pair
    s = audit.plan_summary(profile_table(events, ["event_id", "user_id"]))
    assert s["shuffles"] <= 2
    assert not s["cartesian"]


def test_psi_stable_slices_near_zero_and_shift_detected(spark):
    from vector_indexer_spark.operators.profile import psi_by_slice

    # two slices with the SAME distribution: each matches the pooled
    # corpus, so both PSI ~ 0 (and exactly equal to each other)
    same = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(1000)]
        + [("b", float((i * 7) % 100)) for i in range(1000)],
        "source string, v double",
    )
    stable = {
        r.group: r.psi_nanos / 1e9
        for r in psi_by_slice(
            same, "v", by_col="source", lo=0.0, hi=500.0, n_bins=5
        ).collect()
    }
    assert abs(stable["a"]) < 0.01 and abs(stable["b"]) < 0.01
    assert stable["a"] == stable["b"]  # identical distributions

    # add a shifted slice: it must score far above the stable ones,
    # and above the 0.25 "shifted" convention — while the stable
    # slices only inherit the pooled-corpus contamination
    mixed = same.union(
        spark.createDataFrame(
            [("c", 400.0 + float(i % 100)) for i in range(1000)],
            "source string, v double",
        )
    )
    out = {
        r.group: r.psi_nanos / 1e9
        for r in psi_by_slice(
            mixed, "v", by_col="source", lo=0.0, hi=500.0, n_bins=5
        ).collect()
    }
    assert out["c"] > 0.25
    assert out["c"] > out["a"] and out["c"] > out["b"]


def test_psi_validation(spark):
    import pytest as _pytest

    from vector_indexer_spark.operators.profile import psi_by_slice

    df = spark.createDataFrame([("a", 1.0)], "source string, v double")
    with _pytest.raises(ValueError):
        psi_by_slice(df, "v", lo=1.0, hi=1.0)
    with _pytest.raises(ValueError):
        psi_by_slice(df, "v", lo=0.0, hi=1.0, n_bins=0)


def test_rank_normalize_and_blend(spark):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.profile import (
        blend_signals,
        rank_normalize,
    )

    # 100 rows, v = 0..99: percentile of v should be ~v/100
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("v")
    )
    out = rank_normalize(df, {"v": (0.0, 100.0)}, bins=100)
    got = {r.doc_id: r.v_pctl_micros for r in out.collect()}
    for i in (0, 25, 50, 99):
        assert got[i] == i * 10_000  # i rows strictly below
    # blending two anti-correlated signals flattens the ensemble
    df2 = df.withColumn("w", (F.lit(99.0) - F.col("v")))
    b = blend_signals(
        df2, {"v": (0.0, 100.0), "w": (0.0, 100.0)}, bins=100
    )
    rows = b.collect()
    blends = {r.blend_micros for r in rows}
    assert blends == {495_000}  # pctl(v) + pctl(99-v) = 99 bins -> mean
    assert set(rows[0].asDict()) >= {
        "doc_id", "v", "w", "v_pctl_micros", "w_pctl_micros", "blend_micros"
    }


def test_rank_normalize_no_corpus_window(spark):
    from pyspark.sql import functions as F

    from vector_indexer_spark.operators.profile import rank_normalize
    from vector_indexer_spark.plans import audit

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("v")
    )
    import re as _re

    plan = audit.executed_plan(rank_normalize(df, {"v": (0.0, 1000.0)}))
    wins = _re.findall(r"Window .*", plan)
    for w in wins:  # only the bins-ledger cumsum may be unpartitioned
        assert "__c" in w
