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


# ---------------------------------------------------------------------------
# Streaming near-dup: live MinHash-LSH candidate pairs
# ---------------------------------------------------------------------------

LSH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.StringType(), False),
        T.StructField("new_id", T.LongType(), False),
        T.StructField("prior_id", T.LongType(), False),
    ]
)
LSH_STATE_SCHEMA = T.StructType(
    [T.StructField("seen_ids", T.ArrayType(T.LongType()), False)]
)


def streaming_banded_buckets(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, band, bucket) for a STREAM — the streaming-legal
    formulation of ``operators.dedup.banded_signatures``.

    The batch path shingles via posexplode + a ``lead`` window, which
    Structured Streaming forbids (non-time windows need a full
    partition). Here the whole signature is scan-local: distinct
    shingle hashes as an array expression
    (``shingle_hashes_expr``), each MinHash as ``array_min`` over a
    ``transform`` — per-row, stateless, so it runs unchanged on a
    stream. (Batch uses the exploded form because the interpreted
    higher-order functions are ~10× slower per shingle — a per-batch
    cost a stream amortizes.) Hash constants are shared with the batch
    path, so buckets agree bit-for-bit (pytest-locked).
    """
    from vector_indexer_spark.functions.text import (  # noqa: PLC0415
        HASH_MOD,
        shingle_hashes_expr,
    )
    from vector_indexer_spark.operators.dedup import (  # noqa: PLC0415
        minhash_params,
    )

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    params = minhash_params(num_hashes)
    sh = F.array_sort(shingle_hashes_expr(text_col, shingle_k))

    def _perm(a: int, b: int):
        # Spark infers HOF arity from the Python signature — keep the
        # lambda strictly unary and close over (a, b) here instead
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_MOD)

    sig_cols = [
        F.coalesce(
            F.array_min(F.transform(F.col("__sh"), _perm(a, b))),
            F.lit(HASH_MOD).cast("long"),
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = (
        stream_df.select(
            F.col(id_col).alias("doc_id"), sh.alias("__sh")
        )
        .filter(F.size("__sh") > 0)  # shingle-less docs never band
        .select("doc_id", *sig_cols)
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"s{b * rows + r}") for r in range(rows)],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def _make_bucket_matcher(cap: int, ttl_ms: int | None):
    def _match(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: list[int] = (
            list(state.get[0]) if state.exists else []
        )
        new_ids: list[int] = []
        prior_ids: list[int] = []
        members = list(seen)
        batch_ids: list[int] = []
        for pdf in pdfs:
            if not pdf.empty:
                batch_ids.extend(int(x) for x in pdf["doc_id"])
        # arrival order within a micro-batch is not meaningful; process
        # in id order so replays are deterministic
        for did in sorted(set(batch_ids)):
            if did in members:
                continue
            if len(members) >= cap:
                # saturated bucket = mass boilerplate; stop pairing AND
                # stop growing state (the batch path drops such buckets
                # whole — see lsh_candidate_pairs.max_bucket_size)
                break
            for prior in members:
                new_ids.append(did)
                prior_ids.append(prior)
            members.append(did)
        state.update((members,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if new_ids:
            yield pd.DataFrame(
                {
                    "band": [int(key[0])] * len(new_ids),
                    "bucket": [key[1]] * len(new_ids),
                    "new_id": new_ids,
                    "prior_id": prior_ids,
                }
            )

    return _match


def streaming_lsh_candidates(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 10_000,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Live near-dup candidate pairs: every arriving doc is checked
    against all PRIOR docs sharing any MinHash band bucket, emitting
    ``(band, bucket, new_id, prior_id)`` — the streaming twin of
    :func:`operators.dedup.incremental_lsh_candidates` with the
    banded manifest held as keyed state instead of a table.

    State per (band, bucket) is the member id list, bounded by
    ``max_bucket_size`` (a saturated bucket stops pairing AND growing
    — boilerplate belongs to exact dedup) and by ``state_ttl_ms``
    (the dedup horizon). A doc appears in ``bands`` buckets, so the
    same pair can emit once per shared band; downstream consumers
    ``distinct()`` on (new_id, prior_id) — kept per-band here so the
    emission is append-mode monotonic.
    """
    banded = streaming_banded_buckets(
        stream_df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_bucket_matcher(max_bucket_size, state_ttl_ms),
        LSH_OUTPUT_SCHEMA,
        LSH_STATE_SCHEMA,
        "append",
        timeout,
    )


def streaming_dedup_vs_manifest(
    stream_df: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_incremental_exact``:
    drop arriving docs whose content hash exists in the STANDING
    corpus manifest (a static frame — Structured Streaming plans a
    stream-static LEFT ANTI join, re-planned per micro-batch), then
    first-occurrence-dedup the survivors across the stream itself via
    the keyed-state path of :func:`streaming_dedup`.

    The static side is ``content_hash_manifest`` output; at scale it
    reads from the manifest table on disk, so new corpus commits are
    picked up at the next micro-batch without restarting the query.
    In-stream cross-batch state stays bounded by ``state_ttl_ms``
    exactly as in :func:`streaming_dedup`.
    """
    hashed = stream_df.select(
        F.sha2(F.col(text_col), 256).alias("content_hash"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    m = manifest.select("content_hash")
    fresh = hashed.join(m, "content_hash", "left_anti")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return fresh.groupBy("content_hash").applyInPandasWithState(
        _make_first_seen(state_ttl_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )
