"""Structured Streaming: incremental sparse-posting ingest.

The streaming twin of ``operators.sparse.sparse_manifest``, matching
the dedup family's manifest pattern (``streaming/dedup.py``): each
micro-batch of documents is reduced to ``(id, term, tf)`` postings by
the SAME function the batch path uses, then appended to the posting
manifest. The reference is batch-only (SURVEY §2.10); this is the
post-parity extension SURVEY §7 sketches for every ingest family.

Correctness shape: tf is a PER-DOCUMENT statistic, so batch-local
aggregation is exact whenever a document arrives within one
micro-batch (the ingest contract — the same assumption
``start_vector_ingest`` makes for vector rows; upstream exactly-once
delivery or the streaming dedup rung handles redelivery). Corpus
statistics (df, N, avgdl) are NOT maintained as separate state:
``sparse_search_manifest`` derives them from the manifest at query
time, so every append refreshes them exactly — the df-staleness
contract is "stale only between append and query", with no stat
store to drift or checkpoint.

Scale shape: ``foreachBatch`` + hash-bucketed parquet append — each
batch shuffles only its own postings once on (id, term) for the tf
reduce, then writes term-bucket partitions so the posting join's
term-key scan prunes buckets. No state store, no watermark (nothing
is time-windowed), no standing-corpus re-read: per-batch cost is
delta-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_indexer_spark.operators.sparse import sparse_manifest

# number of term-hash buckets in the manifest layout; a power of two
# well below vocab_size so each bucket holds many terms (small-file
# safety) while a single-term lookup still prunes 63/64 of the data
N_TERM_BUCKETS = 64


def posting_batch(
    batch_df: DataFrame,
    *,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The per-batch body of the stream: postings for THIS batch only,
    with the manifest layout's bucket column attached."""
    return sparse_manifest(
        batch_df, vocab_size=vocab_size, id_col=id_col, text_col=text_col
    ).withColumn("term_bucket", F.pmod(F.col("term"), F.lit(N_TERM_BUCKETS)))


def start_posting_append(
    stream_df: DataFrame,
    manifest_path: str,
    checkpoint_dir: str,
    *,
    vocab_size: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = False,
):
    """Start the posting-append stream over a streaming document frame
    ``(doc_id, text, ...)``. Returns the StreamingQuery. Read the
    manifest back with ``spark.read.parquet(manifest_path)`` and query
    it with ``sparse_search_manifest`` (drop ``term_bucket`` or leave
    it — the search kernel ignores extra columns)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            posting_batch(
                batch_df,
                vocab_size=vocab_size,
                id_col=id_col,
                text_col=text_col,
            )
            .repartition("term_bucket")
            .write.mode("append")
            .partitionBy("term_bucket")
            .parquet(manifest_path)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
