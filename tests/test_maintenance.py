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


class TestVersionedTables:
    def test_commit_read_time_travel(self, spark, tmp_path):
        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "vt")
        df1 = spark.range(10).withColumnRenamed("id", "k")
        df2 = spark.range(25).withColumnRenamed("id", "k")
        m1 = mt.write_version(df1, t, note="initial")
        m2 = mt.write_version(df2, t, note="extended")
        assert (m1["version"], m2["version"]) == (1, 2)
        assert mt.latest_version(t) == 2
        assert mt.read_version(spark, t).count() == 25       # latest
        assert mt.read_version(spark, t, 1).count() == 10    # time travel
        hist = mt.history(t)
        assert [h["version"] for h in hist] == [1, 2]
        assert hist[0]["note"] == "initial" and hist[0]["n_rows"] == 10

    def test_old_snapshots_immutable_under_new_commits(self, spark, tmp_path):
        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "vt2")
        df1 = spark.range(5).withColumnRenamed("id", "k")
        mt.write_version(df1, t)
        v1 = mt.read_version(spark, t, 1)
        rows_before = sorted(r.k for r in v1.collect())
        mt.write_version(spark.range(3).withColumnRenamed("id", "k"), t)
        assert sorted(r.k for r in mt.read_version(spark, t, 1).collect()) == rows_before

    def test_vacuum_keeps_latest(self, spark, tmp_path):
        import pytest as _pytest

        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "vt3")
        for n in (4, 5, 6):
            mt.write_version(spark.range(n).withColumnRenamed("id", "k"), t)
        removed = mt.vacuum_versions(t, keep_last=1)
        assert removed == [1, 2]
        assert mt.read_version(spark, t).count() == 6
        with _pytest.raises(FileNotFoundError, match="vacuumed|not exist"):
            mt.read_version(spark, t, 1)
        with _pytest.raises(ValueError):
            mt.vacuum_versions(t, keep_last=0)

    def test_empty_table_errors(self, spark, tmp_path):
        import pytest as _pytest

        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "vt4")
        assert mt.latest_version(t) == 0
        assert mt.history(t) == []
        with _pytest.raises(FileNotFoundError):
            mt.read_version(spark, t)

    def test_version_diff_composes_with_snapshot_diff(self, spark, tmp_path):
        """Time travel + CDC diff answer 'what changed between corpus
        version 1 and 2' — the composition a reproducible-pipeline
        audit runs."""
        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "vt5")
        df1 = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        )
        df2 = spark.createDataFrame(
            [(2, "b"), (3, "C"), (4, "d")], "k long, v string"
        )
        mt.write_version(df1, t)
        mt.write_version(df2, t)
        diff = mt.snapshot_diff(
            mt.read_version(spark, t, 1), mt.read_version(spark, t, 2), ["k"]
        )
        got = {r.k: r.change_type for r in diff.collect()}
        assert got == {1: "removed", 3: "changed", 4: "added"}


class TestOptimizeTable:
    def test_compacts_and_preserves_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "opt")
        df = spark.range(5000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("x"),
            ((F.col("id") * 31) % 89).alias("y"),
        )
        df.repartition(40).write.parquet(t)  # many small files
        before = set(r.k for r in spark.read.parquet(t).collect())
        stats = mt.optimize_table(spark, t, ["x", "y"], num_files=4)
        assert stats["files_after"] < stats["files_before"]
        assert stats["files_after"] <= 4
        assert stats["rows"] == 5000
        after = set(r.k for r in spark.read.parquet(t).collect())
        assert after == before

    def test_crash_recovery_restores_backup(self, spark, tmp_path):
        import os
        import shutil

        from pyspark.sql import functions as F

        from vector_indexer_spark.operators import maintenance as mt

        t = str(tmp_path / "opt2")
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("x"),
            (F.col("id") % 5).alias("y"),
        ).write.parquet(t)
        # simulate a crash between the two renames: live table gone,
        # rows stranded in backup
        os.rename(t, t + "__optimize__backup")
        stats = mt.optimize_table(spark, t, ["x", "y"], num_files=2)
        assert stats["rows"] == 100
        assert spark.read.parquet(t).count() == 100
        assert not os.path.exists(t + "__optimize__backup")
