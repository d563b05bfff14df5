"""Ingest semantics (S1, F4) + config defaults (reference api_tests.rs)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.api import ingest_records
from vector_indexer_spark.config import IndexConfig
from vector_indexer_spark.functions.distance import dist_expr


def test_ingest_assigns_ordinals_and_defaults_ts(spark):
    rows = [
        (100, [1.0, 2.0], None),
        (50, [3.0, 4.0], 1234),
        (75, [5.0, 6.0], None),
    ]
    df = spark.createDataFrame(
        rows, "external_id long, values array<float>, ts long"
    )
    now = int(time.time())
    out = {r.external_id: r for r in ingest_records(df).collect()}
    # internal id = ordinal in external_id order (reference assigns
    # ordinals at ingest, src/vector_store.rs:31-34)
    assert out[50].id == 0 and out[75].id == 1 and out[100].id == 2
    # F4 — explicit ts kept, missing ts defaulted to now
    assert out[50].ts == 1234
    assert abs(out[100].ts - now) < 120
    assert abs(out[75].ts - now) < 120


def test_ingest_ordinals_distributed_and_dense(spark):
    # 1000 shuffled ids across many input partitions: ordinals must be
    # the dense rank of external_id, and the plan must carry no
    # single-partition exchange (the old global Window.orderBy shape)
    df = (
        spark.range(1_000)
        .repartition(16)
        .select(
            ((F.col("id") * 7919) % 10_007).alias("external_id"),
            F.array(F.col("id").cast("float")).alias("values"),
        )
    )
    out = ingest_records(df, ts_col=None)
    assert "Exchange SinglePartition" not in out._jdf.queryExecution().executedPlan().toString()
    rows = out.select("id", "external_id").collect()
    by_key = sorted(rows, key=lambda r: r.external_id)
    assert [r.id for r in by_key] == list(range(1_000))


def test_ingest_without_ts_column(spark):
    df = spark.createDataFrame(
        [(1, [1.0]), (2, [2.0])], "external_id long, values array<float>"
    )
    out = ingest_records(df, ts_col=None).collect()
    assert all(r.ts > 0 for r in out)


def test_config_defaults_and_clamps():
    # defaults k=10, n_probe=20, caps 10k (api_tests.rs:28-37)
    cfg = IndexConfig(dimension=8, index_dir="/tmp/x")
    assert cfg.default_k == 10 and cfg.default_n_probe == 20
    assert cfg.clamp_k(None) == 10
    assert cfg.clamp_n_probe(None) == 20
    assert cfg.clamp_k(50_000) == 10_000  # P4
    assert cfg.clamp_n_probe(123_456) == 10_000
    with pytest.raises(ValueError):
        cfg.clamp_k(0)  # P3
    with pytest.raises(ValueError):
        cfg.clamp_n_probe(-1)


def test_sqrt_distance_test_util(spark):
    # F3 — sqrt distance exists only as a test utility (reference
    # tests/test_utils/mod.rs:90-98)
    df = spark.createDataFrame(
        [([0.0, 3.0], [4.0, 0.0])], "a array<float>, b array<float>"
    )
    got = df.select(dist_expr("a", "b").alias("d")).collect()[0].d
    assert got == 5.0
