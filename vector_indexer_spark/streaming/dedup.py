"""Stateful streaming dedup: emit only the first occurrence of each
content hash across the whole stream.

The streaming twin of ``operators.dedup.dedup_exact``: state is one
boolean per content hash, managed by ``applyInPandasWithState`` (the
custom-stateful-operator surface of Structured Streaming). At 100 TB
of stream history the state store is the bound — hashes are 64-char
keys, so production deployments pass ``state_ttl_ms`` matching
their dedup horizon; unbounded history belongs in the batch operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def _make_first_seen(ttl_ms: int | None):
    def _first_seen(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # dedup horizon passed → forget the hash (bounds the store)
            state.remove()
            return
        if state.exists:
            # hash already emitted in an earlier micro-batch → drop all
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        first = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values("doc_id").iloc[0]
            if first is None or cand["doc_id"] < first["doc_id"]:
                first = cand
        if first is None:
            return
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "doc_id": [int(first["doc_id"])],
                "text": [first["text"]],
            }
        )

    return _first_seen


def streaming_dedup(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence-only document stream keyed by sha256(text).

    ``state_ttl_ms`` bounds the state store: a hash unseen for that
    long is forgotten (its next occurrence re-emits). ``None`` keeps
    state forever — only for bounded streams.
    """
    hashed = stream_df.select(
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _make_first_seen(state_ttl_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )


def start_streaming_dedup(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
):
    """Run the dedup stream into a parquet sink; state (and therefore
    cross-run dedup) persists through the checkpoint."""
    writer = (
        streaming_dedup(
            stream_df,
            text_col=text_col,
            id_col=id_col,
            state_ttl_ms=state_ttl_ms,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
