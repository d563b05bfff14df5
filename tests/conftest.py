"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os

import numpy as np
import pytest

from vector_indexer_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute scale tests (always run in CI)"
    )


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="vector-indexer-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield spark


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def emb_np(embeddings):
    rows = embeddings.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float32)
    return ids, mat
