"""Streaming as-of join: attach each user's latest prior event of one
type to events of another, with carried state across micro-batches.

The streaming twin of ``streaming.events.asof_join_prior``. State per
user is THREE SCALARS (id/ts/value of the newest right-type event) —
the minimal carried state an as-of join needs — managed by
``applyInPandasWithState``, Structured Streaming's custom-stateful
surface. Contrast with a stream-stream interval join, whose state
buffers every event inside the join window.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("prior_event_id", T.LongType(), True),
        T.StructField("prior_ts", T.LongType(), True),
        T.StructField("prior_value", T.DoubleType(), True),
        T.StructField("gap_ns", T.LongType(), True),
    ]
)
ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("prior_event_id", T.LongType(), True),
        T.StructField("prior_ts", T.LongType(), True),
        T.StructField("prior_value", T.DoubleType(), True),
    ]
)


def _make_asof_fn(left_type: str, right_type: str, ttl_ms: int | None):
    def _asof(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        carried = (
            state.get if state.exists else (None, None, None)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"]).reset_index(drop=True)
        is_right = (batch["event_type"] == right_type).to_numpy()
        # carried-before-row-i = newest right-type event among batch
        # rows < i, seeded with cross-batch state: one ffill over
        # nullable-Int64 columns (<NA> = "no event yet") — vectorized,
        # no per-event Python loop, and ids/ns-timestamps stay exact
        # integers (float64 would corrupt ns epochs, which exceed 2^53)
        seed = pd.DataFrame(
            {
                "event_id": pd.array([carried[0]], dtype="Int64"),
                "ts": pd.array([carried[1]], dtype="Int64"),
                "value": pd.array(
                    [carried[2]], dtype="Float64"
                ),
            }
        )
        masked = pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("Int64").where(is_right),
                "ts": batch["ts"].astype("Int64").where(is_right),
                "value": batch["value"].astype("Float64").where(is_right),
            }
        )
        rvals = pd.concat([seed, masked], ignore_index=True).ffill()
        # rvals row i holds the state after batch rows < i
        prior = rvals.iloc[:-1].reset_index(drop=True)
        # per-COLUMN scalar extraction: a row-wise iloc[-1] would
        # coerce the mixed Int64/Float64 row to Float64 and round ns
        # timestamps above 2^53
        last = {c: rvals[c].iloc[-1] for c in ("event_id", "ts", "value")}
        state.update(
            (
                None if pd.isna(last["event_id"]) else int(last["event_id"]),
                None if pd.isna(last["ts"]) else int(last["ts"]),
                None if pd.isna(last["value"]) else float(last["value"]),
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        left_mask = (batch["event_type"] == left_type).to_numpy()
        if not left_mask.any():
            return
        out = batch.loc[left_mask]
        pid = prior.loc[left_mask, "event_id"]
        pts = prior.loc[left_mask, "ts"]
        pval = prior.loc[left_mask, "value"]
        gap = out["ts"].astype("Int64") - pts
        yield pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": int(key[0]),
                "ts": out["ts"].astype("int64"),
                "prior_event_id": pid,
                "prior_ts": pts,
                "prior_value": pval.astype("float64"),
                "gap_ns": gap,
            }
        )

    return _asof


def streaming_asof_prior(
    stream_df: DataFrame,
    *,
    left_type: str = "purchase",
    right_type: str = "click",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Per-user last-``right_type``-before-``left_type`` attachment as
    a stateful stream.

    Within a micro-batch rows are processed in ``(ts, event_id)``
    order, so intra-batch results match the batch operator exactly;
    *across* batches attachment is as-of arrival — a right-type event
    arriving after a left-type event it time-precedes is not
    retroactively attached (the batch twin is the reconciliation
    path; the usual streaming/batch split). ``state_ttl_ms`` evicts
    idle users to bound the store.

    Expects ``(event_id, user_id, ts, event_type, value)`` with
    ``ts`` in epoch nanoseconds (ids/timestamps are carried as exact
    nullable Int64 end to end — never through float64, which cannot
    represent ns epochs above 2^53).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    sel = stream_df.select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return sel.groupBy("user_id").applyInPandasWithState(
        _make_asof_fn(left_type, right_type, state_ttl_ms),
        ASOF_OUTPUT_SCHEMA,
        ASOF_STATE_SCHEMA,
        "append",
        timeout,
    )
