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
