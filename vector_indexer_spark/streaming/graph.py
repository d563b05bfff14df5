"""Structured Streaming: incremental graph-index maintenance.

The streaming twin of :func:`operators.graph_index.add_to_graph_index`
— the graph-family counterpart of ``streaming/ingest.py``'s IVF
incremental ingest. New vectors stream in; each micro-batch is routed
through the LIVE index (the same two-layer search a query takes),
gains bidirectional edges plus a batch-internal k-NN graph, and is
appended to both the edge table and the caller's canonical vector
table — the next micro-batch (and the next batch search) sees it.

Scale shape: every micro-batch is one bounded `add_to_graph_index`
call — a two-layer beam search over the batch (broadcast query side),
a batch-sized NN-Descent, and two parquet appends. No state store:
the graph itself IS the state, re-read per batch via the stream-static
read of the vector path (re-planned each micro-batch, so concurrent
compactions are picked up live). Degree growth across many batches is
bounded by periodic :func:`~...graph_index.compact_graph_index`.

Exactly-once: foreachBatch is at-least-once, so a micro-batch retried
after a sink-side crash is RE-DELIVERED. The sink anti-joins the batch
against ids already in the vector table before doing anything — a
replayed batch whose rows all landed becomes a no-op, so neither
duplicate vector rows nor duplicate result ranks can be produced
(duplicate EDGES from a crash in the edges-then-vectors window remain
possible and are dedup'd by compaction; search tolerates them).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_indexer_spark.operators.graph_index import (
    GraphIndex,
    add_to_graph_index,
)


def start_graph_index_ingest(
    index: GraphIndex,
    stream_df: DataFrame,
    vectors_path: str,
    checkpoint_dir: str,
    *,
    beam: int = 16,
    max_hops: int = 4,
    entry_fanout: int = 8,
    batch_iterations: int = 2,
    trigger_available_now: bool = False,
):
    """Start the incremental graph-maintenance stream.

    ``stream_df`` is a streaming DataFrame of vector records carrying
    the index's ``id_col``/``vec_col``; ``vectors_path`` is the
    canonical parquet vector table the index searches against (the
    batch rows are appended to it AFTER their edges land, so a crash
    between the two appends leaves extra edges toward known ids — the
    recoverable order). Returns the StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # within-batch dedup first: an at-least-once source can fold a
        # redelivery into ONE micro-batch, where the landed-ids guard
        # below can't see it (both copies are new); batches are small,
        # so the extra exchange is noise
        batch = batch_df.select(index.id_col, index.vec_col).dropDuplicates(
            [index.id_col]
        )
        vectors = spark.read.parquet(vectors_path)
        # at-least-once replay guard: drop rows whose ids already
        # landed (a retried micro-batch otherwise re-appends the
        # vectors, and duplicate vector rows produce duplicate scored
        # rows downstream). Both joins broadcast the BATCH side — the
        # corpus never shuffles; its id column scans once per batch.
        seen = vectors.select(index.id_col).join(
            F.broadcast(batch.select(index.id_col).distinct()),
            index.id_col,
            "left_semi",
        )
        batch = batch.join(
            F.broadcast(seen), index.id_col, "left_anti"
        )
        # materialize NOW: the append below writes into vectors_path,
        # which this plan also READS (the replay guard above) — don't
        # rely on Spark having snapshotted the file listing at
        # analysis time. Note the guard drops a redelivered id even if
        # it carries a DIFFERENT vector: id re-use is a dropped
        # duplicate, not an upsert (use the maintenance upsert path
        # for updates).
        batch = batch.localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        add_to_graph_index(
            spark, index, vectors, batch,
            beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
            batch_iterations=batch_iterations,
        )
        batch.write.mode("append").parquet(vectors_path)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", os.fspath(checkpoint_dir))
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
