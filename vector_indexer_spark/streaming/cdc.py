"""Streaming CDC state — the live twin of
``streaming.events.latest_by_key``.

A change stream compacts to current state with a per-key
``max_by(payload, (ts, tiebreak))`` aggregation. In Structured
Streaming that aggregate IS the state: one row per key, updated in
place each micro-batch — the materialized-view shape (Delta's
``MERGE``-to-latest, Kafka log compaction) as a plain streaming
aggregation. State is bounded by key cardinality, not stream length;
no watermark is needed because the aggregate is a pure lattice join
(later (ts, tiebreak) always wins, replay is idempotent).

Batch≡stream equality is the correctness pin: the streamed state
table must be row-identical to ``latest_by_key`` over the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_latest_state(
    stream: DataFrame,
    *,
    key_cols: list[str] | None = None,
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-key latest-row aggregation over a streaming frame.

    Non-key columns ride inside a struct picked by ``max_by`` on the
    (order, tiebreak) pair — deterministic under replay and
    micro-batch boundaries alike.
    """
    keys = key_cols or ["user_id"]
    payload = [c for c in stream.columns if c not in keys]
    winner = F.max_by(
        F.struct(*payload),
        F.struct(F.col(order_col), F.col(tiebreak_col)),
    ).alias("__latest")
    agg = stream.groupBy(*keys).agg(winner)
    return agg.select(*keys, "__latest.*")


def start_latest_state(
    stream: DataFrame,
    checkpoint: str,
    *,
    key_cols: list[str] | None = None,
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    queryName: str = "latest_state",
    trigger_available_now: bool = False,
):
    """Run the CDC compaction as a streaming query into a memory sink
    (complete mode: the state is key-cardinality-sized by design; a
    deployment writes update-mode rows into a keyed table instead)."""
    writer = (
        streaming_latest_state(
            stream,
            key_cols=key_cols,
            order_col=order_col,
            tiebreak_col=tiebreak_col,
        )
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_versioned_sink(
    stream_df,
    table_dir: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = False,
    note_prefix: str = "stream",
):
    """Stream → versioned table: each non-empty micro-batch commits as
    a NEW immutable version of ``table_dir`` via
    ``maintenance.write_version`` (foreachBatch — the Structured
    Streaming escape hatch for sinks with their own transaction
    protocol). Consumers time-travel to any micro-batch boundary, and
    a training run can pin "corpus as of version N" while the stream
    keeps committing ahead of it.

    Exactly-once caveat, stated rather than hidden: foreachBatch is
    at-least-once across RESTARTS — a batch that committed a version
    but crashed before the checkpoint advanced will re-commit on
    recovery as a duplicate version with identical content (the
    manifest ``note`` carries the epoch id, making such twins visible
    and reconcilable). Within a healthy run, one batch = one version.
    """
    from vector_indexer_spark.operators.maintenance import (  # noqa: PLC0415
        write_version,
    )

    def _commit(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_version(
            batch_df, table_dir, note=f"{note_prefix}-epoch-{epoch_id}"
        )

    writer = (
        stream_df.writeStream.foreachBatch(_commit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
