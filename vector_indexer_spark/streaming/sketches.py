"""Streaming sketches — a live HyperLogLog over an unbounded stream.

The batch HLL register table (operators/sketches.py) has a property
that makes it the *ideal* streaming aggregate: its state is bounded at
2**p rows no matter how much data flows through, and its update is a
per-register MAX — associative, commutative, and idempotent. So a
``groupBy(register).max(rho)`` in Structured Streaming needs no
watermark and no state eviction: the sketch IS the state, and
``complete`` output mode re-emits all ≤ 2**p rows per trigger.

This is the streaming twin of ``sketch_hll_registers``; exactness is
pinned by the batch≡stream equality test (the streamed registers are
bit-identical to a batch pass over the same files — same md5-derived
expressions on both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_indexer_spark.operators.sketches import hll_register_rho


def streaming_hll_registers(
    stream: DataFrame, col: str, *, p: int = 12
) -> DataFrame:
    """Register-table aggregation over a streaming frame: the same
    (register, max_rho) derivation as the batch path, kept as bounded
    streaming state (≤ 2**p rows)."""
    reg, rho = hll_register_rho(F.col(col), p)
    return (
        stream.filter(F.col(col).isNotNull())
        .select(reg.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def start_hll_registers(
    stream: DataFrame,
    checkpoint: str,
    *,
    col: str,
    p: int = 12,
    queryName: str = "hll_registers",
    trigger_available_now: bool = False,
):
    """Run the live HLL as a streaming query into a memory sink.

    ``complete`` mode is correct AND cheap here precisely because the
    aggregate is sketch-sized: each trigger rewrites ≤ 2**p rows. At
    deployment scale the sink would be a compacted table the serving
    layer reads with :func:`...operators.sketches.hll_estimate`.
    """
    writer = (
        streaming_hll_registers(stream, col, p=p)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_cms_table(
    stream: DataFrame, col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Live Count-Min sketch: the same salted-bucket derivation as the
    batch path, as a streaming count aggregation. State is bounded at
    depth×width rows; counts are exact per micro-batch under
    Structured Streaming's exactly-once state, so the streamed sketch
    equals the batch sketch over the same files."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from vector_indexer_spark.operators.sketches import _salted_bucket

    rows = stream.filter(F.col(col).isNotNull())
    buckets = F.array(
        *[
            _salted_bucket(F.col(col), f"{d}:", width)
            for d in range(depth)
        ]
    )
    return (
        rows.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def start_cms_table(
    stream: DataFrame,
    checkpoint: str,
    *,
    col: str,
    depth: int = 4,
    width: int = 1024,
    queryName: str = "cms_table",
    trigger_available_now: bool = False,
):
    """Run the live CMS into a memory sink (complete mode — the state
    is sketch-sized by design)."""
    writer = (
        streaming_cms_table(stream, col, depth=depth, width=width)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
