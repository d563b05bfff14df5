"""Structured Streaming: windowed event rollups with late-data handling.

The streaming expression of the batch ``events_hourly`` query
(entry_queries): tumbling event-time windows with a watermark so late
events are folded in up to the allowed delay and state is bounded.
Post-parity extension — the reference has no streaming (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window_size: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Works on both a streaming DataFrame (bounded state via the
    watermark) and a batch DataFrame (watermark is a no-op) — one
    definition, two execution modes, which is the point of expressing
    the rollup in Structured Streaming's model.
    """
    withm = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        withm.groupBy(
            F.window(F.col(ts_col), window_size).alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias(
                "value_sum_micros"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum_micros",
        )
    )


def start_hourly_rollup(
    events_stream: DataFrame,
    checkpoint_dir: str,
    *,
    queryName: str = "events_hourly_rollup",
    trigger_available_now: bool = False,
    output_mode: str = "complete",
):
    """Run the rollup as a streaming query into an in-memory sink
    (swap for a Delta/parquet sink in production — and switch to
    ``append``, where the watermark closes windows; a memory sink in
    append mode would emit nothing until a later batch advances the
    watermark past a window end)."""
    writer = (
        hourly_rollup(events_stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
