"""Maintenance-layer invariants: snapshot diff semantics, dynamic
partition overwrite isolation, constraint-validator rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.maintenance import (
    snapshot_diff,
    upsert_partitions,
    validate_constraints,
)


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(
        old, new, ["k"]
    ).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}
    with_unchanged = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            old, new, ["k"], include_unchanged=True
        ).collect()
    }
    assert with_unchanged[2] == "unchanged"


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert snapshot_diff(old, new, ["k"]).count() == 0  # NULL == NULL
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(old, new, ["k"], compare_cols=["nope"])


def test_upsert_partitions_touches_only_landed_days(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("d1", 1), ("d1", 2), ("d2", 3)], "day string, v long"
    )
    base.write.partitionBy("day").parquet(path)
    # backfill d2 only; d1 must survive byte-identical
    fix = spark.createDataFrame([("d2", 99)], "day string, v long")
    upsert_partitions(fix, path, "day")
    got = {
        (r["day"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("d1", 1), ("d1", 2), ("d2", 99)}


def test_validate_constraints_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (1, "ok", -2.0),     # dup key + below range
            (None, "bad", 50.0), # null key + bad domain
        ],
        "k long, status string, x double",
    )
    got = {
        (r["rule"], r["column"]): r["n_violations"]
        for r in validate_constraints(
            df,
            not_null=["k"],
            unique=[["k"]],
            accepted_values={"status": ["ok"]},
            ranges={"x": (0.0, 10.0)},
        ).collect()
    }
    assert got[("not_null", "k")] == 1
    assert got[("unique", "k")] == 1
    assert got[("accepted_values", "status")] == 1
    assert got[("range", "x")] == 2  # -2 below, 50 above


def test_validate_constraints_empty_rules(spark):
    df = spark.createDataFrame([(1,)], "k long")
    assert validate_constraints(df).count() == 0
