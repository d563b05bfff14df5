"""Z-order layout: Morton-key correctness vs a pure-Python reference,
locality of the written files, and contracts."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from vector_indexer_spark.operators.layout import (
    scale_to_bits,
    write_zordered,
    zorder_key_expr,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    z = 0
    n = len(vals)
    for b in range(bits):
        for j, v in enumerate(vals):
            z += ((v >> b) & 1) << (b * n + j)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(x, y) for x in [0, 1, 5, 255, 256, 65535]
            for y in [0, 3, 17, 65535]]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key_expr(["x", "y"], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["x"], r["y"]], 16)


def test_zorder_key_three_columns(spark):
    df = spark.createDataFrame([(5, 9, 1023)], "a long, b long, c long")
    z = df.select(zorder_key_expr(["a", "b", "c"], bits=10)).first()[0]
    assert z == _morton_ref([5, 9, 1023], 10)


def test_zorder_contracts(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key_expr(["a"])
    with pytest.raises(ValueError, match="bits"):
        zorder_key_expr(["a", "b"], bits=32)  # 64 > 62
    with pytest.raises(ValueError, match="hi > lo"):
        scale_to_bits("a", 5, 5)
    with pytest.raises(ValueError, match="num_files"):
        write_zordered(df, "/tmp/x", ["a", "b"], num_files=0)


def test_scale_to_bits_range_and_monotone(spark):
    df = spark.createDataFrame(
        [(float(v),) for v in [-10.0, 0.0, 0.5, 0.9999, 1.0, 99.0]],
        "v double",
    )
    got = [
        r[0]
        for r in df.select(
            scale_to_bits("v", 0.0, 1.0, bits=8)
        ).collect()
    ]
    assert got[0] == 0          # clamped below
    assert got[-1] == 255       # clamped above
    assert got == sorted(got)   # monotone
    assert all(0 <= g <= 255 for g in got)


def test_zordered_files_have_small_bounding_boxes(spark, tmp_path):
    # a 64x64 grid of (x, y): after z-ordered write into 8 files, each
    # file's bounding box must cover far less than the full plane in
    # BOTH dimensions — the property parquet min/max pruning feeds on.
    # (A plain x-sorted write gives full-range y boxes.)
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], bits=6, num_files=8)

    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 8
    areas = []
    for f in files:
        pdf = spark.read.parquet(f)
        lo_x, hi_x, lo_y, hi_y = pdf.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).first()
        areas.append(((hi_x - lo_x + 1) * (hi_y - lo_y + 1)) / 4096.0)
    # perfect z-split of 8 files covers 1/8 of the plane each; allow
    # boundary slop but reject anything near full-plane coverage
    assert max(areas) <= 0.5
    assert sum(areas) / len(areas) <= 0.3


def test_zordered_write_preserves_rows(spark, tmp_path):
    rows = [(x, x * 7 % 32) for x in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    path = str(tmp_path / "z2")
    write_zordered(df, path, ["x", "y"], bits=9, num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    assert back.columns == ["x", "y"]  # key dropped
