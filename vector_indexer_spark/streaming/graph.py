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


def _upsert_changed(
    spark,
    index: GraphIndex,
    vectors: DataFrame,
    batch: DataFrame,
    vectors_path: str,
    *,
    beam: int,
    max_hops: int,
    entry_fanout: int,
    batch_iterations: int,
) -> int:
    """Apply the batch's CHANGED-vector rows as updates: re-link each
    node at its new position (edges first — the recoverable order),
    then replace its canonical vector row via staged rewrite + atomic
    swap. Returns the number of rows updated. See
    :func:`start_graph_index_ingest` ``on_update="upsert"``.
    """
    import shutil  # noqa: PLC0415

    idc, vcc = index.id_col, index.vec_col
    stored = vectors.select(
        F.col(idc), F.col(vcc).alias("__stored")
    )
    # broadcast the BATCH side: the corpus streams through the join
    # without shuffling (the same discipline as the replay guard)
    changed = (
        stored.join(F.broadcast(batch), idc)
        .filter(~(F.col(vcc) == F.col("__stored")))
        .select(idc, vcc)
        # snapshot BEFORE the swap invalidates this plan's file listing
        .localCheckpoint(eager=True)
    )
    n_changed = changed.count()
    if n_changed == 0:
        return 0
    # 1. re-link at the new position: search the corpus MINUS the
    #    updated ids (add_to_graph_index requires disjoint ids); fresh
    #    bidirectional edges land where the vectors now live. Old edges
    #    stay — stale-but-traversable, compaction re-prunes.
    others = vectors.join(
        F.broadcast(changed.select(idc)), idc, "left_anti"
    )
    add_to_graph_index(
        spark, index, others, changed,
        beam=beam, max_hops=max_hops, entry_fanout=entry_fanout,
        batch_iterations=batch_iterations,
    )
    # n_vectors was bumped by the insert pass, but updates add no rows
    from vector_indexer_spark.operators.graph_index import (  # noqa: PLC0415
        _write_meta,
    )

    index.n_vectors -= n_changed
    _write_meta(index.path, index._meta_dict())
    # 2. staged rewrite + atomic swap of the canonical vector table
    staging = f"{vectors_path}__upsert__staging"
    backup = f"{vectors_path}__upsert__backup"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(backup):
        if not os.path.exists(vectors_path):
            os.rename(backup, vectors_path)  # recover a crashed swap
        else:
            shutil.rmtree(backup)
    n_before = vectors.count()
    keep = vectors.join(F.broadcast(changed.select(idc)), idc, "left_anti")
    keep.select(idc, vcc).unionByName(changed).write.parquet(staging)
    n_after = spark.read.parquet(staging).count()
    if n_after != n_before:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"graph upsert row-count mismatch: {n_before} -> {n_after};"
            " staging discarded, live table untouched"
        )
    os.rename(vectors_path, backup)
    os.rename(staging, vectors_path)
    shutil.rmtree(backup)
    return n_changed


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
    on_update: str = "ignore",
):
    """Start the incremental graph-maintenance stream.

    ``stream_df`` is a streaming DataFrame of vector records carrying
    the index's ``id_col``/``vec_col``; ``vectors_path`` is the
    canonical parquet vector table the index searches against (the
    batch rows are appended to it AFTER their edges land, so a crash
    between the two appends leaves extra edges toward known ids — the
    recoverable order). Returns the StreamingQuery.

    ``on_update`` controls what a known id carrying a DIFFERENT
    vector means:

    - ``"ignore"`` (default): a dropped duplicate — at-least-once
      replay safety, the original semantic.
    - ``"upsert"``: a vector UPDATE. The node is re-linked at its new
      position (one ``add_to_graph_index`` pass searching the corpus
      MINUS the updated ids — fresh bidirectional edges from where the
      vector now lives), then the canonical vector rows are replaced
      via staged rewrite + atomic swap. Old edges stay in the table —
      stale but traversable, exactly like duplicate edges from a crash
      window, re-pruned by ``compact_graph_index``. Crash between the
      two steps is safe: edges landed, vector still old → search stays
      consistent on the old vector, and the replayed batch re-detects
      the difference and completes the swap. Updates rewrite the
      vector table, so this mode is for low-rate correction streams,
      not update-dominated load — an update-heavy table wants the
      IVF tier's partition-scoped upsert instead.
    """
    if on_update not in ("ignore", "upsert"):
        raise ValueError(
            f"on_update must be 'ignore' or 'upsert', got {on_update!r}"
        )

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
        if on_update == "upsert":
            _upsert_changed(spark, index, vectors, batch, vectors_path,
                            beam=beam, max_hops=max_hops,
                            entry_fanout=entry_fanout,
                            batch_iterations=batch_iterations)
            # the swap may have replaced the table files — re-plan
            # everything downstream against the post-swap listing
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
        # it carries a DIFFERENT vector: with on_update="ignore" id
        # re-use is a dropped duplicate, not an upsert; with
        # on_update="upsert" the changed-vector rows were already
        # handled above.
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
