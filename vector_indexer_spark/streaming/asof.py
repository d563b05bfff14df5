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


ASOF_NEXT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("next_event_id", T.LongType(), True),
        T.StructField("next_ts", T.LongType(), True),
        T.StructField("next_value", T.DoubleType(), True),
        T.StructField("gap_ns", T.LongType(), True),
    ]
)
# pending left-type events awaiting a later right-type event
ASOF_NEXT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pending_ids", T.ArrayType(T.LongType()), True),
        T.StructField("pending_ts", T.ArrayType(T.LongType()), True),
    ]
)


def _make_asof_next_fn(left_type: str, right_type: str, ttl_ms: int | None):
    def _asof_next(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        if state.hasTimedOut:
            # flush: pending lefts have waited past the TTL with no
            # later right-type event — emit them unmatched (nulls)
            ids, tss = state.get
            state.remove()
            if ids:
                yield pd.DataFrame(
                    {
                        "event_id": pd.array(ids, dtype="int64"),
                        "user_id": uid,
                        "ts": pd.array(tss, dtype="int64"),
                        "next_event_id": pd.array(
                            [None] * len(ids), dtype="Int64"
                        ),
                        "next_ts": pd.array([None] * len(ids), dtype="Int64"),
                        "next_value": pd.array(
                            [None] * len(ids), dtype="Float64"
                        ),
                        "gap_ns": pd.array([None] * len(ids), dtype="Int64"),
                    }
                )
            return
        pend: list[tuple[int, int]] = []
        if state.exists:
            ids, tss = state.get
            pend = [(int(t), int(i)) for i, t in zip(ids or [], tss or [])]
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not batch.empty:
            batch = batch.sort_values(["ts", "event_id"]).reset_index(
                drop=True
            )
            for _, row in batch[batch["event_type"] == left_type].iterrows():
                pend.append((int(row["ts"]), int(row["event_id"])))
        pend.sort()
        rights = batch[batch["event_type"] == right_type] if not batch.empty else None
        out_rows = {
            "event_id": [], "ts": [], "next_event_id": [],
            "next_ts": [], "next_value": [], "gap_ns": [],
        }
        still: list[tuple[int, int]] = []
        if rights is not None and len(rights):
            r_ts = rights["ts"].to_numpy()
            r_id = rights["event_id"].to_numpy()
            r_val = rights["value"].to_numpy()
            j_start = 0
            for lts, lid in pend:
                # two-pointer: earliest right with (ts, id) > (lts, lid)
                j = j_start
                while j < len(r_ts) and (
                    (r_ts[j], r_id[j]) <= (lts, lid)
                ):
                    j += 1
                if j < len(r_ts):
                    out_rows["event_id"].append(lid)
                    out_rows["ts"].append(lts)
                    out_rows["next_event_id"].append(int(r_id[j]))
                    out_rows["next_ts"].append(int(r_ts[j]))
                    out_rows["next_value"].append(float(r_val[j]))
                    out_rows["gap_ns"].append(int(r_ts[j]) - lts)
                else:
                    still.append((lts, lid))
                # pend is sorted, so the match frontier never moves back
                j_start = min(j, len(r_ts) - 1) if len(r_ts) else 0
        else:
            still = pend
        if still:
            state.update(
                (
                    [i for _, i in still],
                    [t for t, _ in still],
                )
            )
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        if out_rows["event_id"]:
            yield pd.DataFrame(
                {
                    "event_id": pd.array(
                        out_rows["event_id"], dtype="int64"
                    ),
                    "user_id": uid,
                    "ts": pd.array(out_rows["ts"], dtype="int64"),
                    "next_event_id": pd.array(
                        out_rows["next_event_id"], dtype="Int64"
                    ),
                    "next_ts": pd.array(out_rows["next_ts"], dtype="Int64"),
                    "next_value": pd.array(
                        out_rows["next_value"], dtype="Float64"
                    ),
                    "gap_ns": pd.array(out_rows["gap_ns"], dtype="Int64"),
                }
            )

    return _asof_next


def streaming_asof_next(
    stream_df: DataFrame,
    *,
    left_type: str = "click",
    right_type: str = "purchase",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Forward as-of as a stateful stream: each ``left_type`` event
    waits in per-user state until the first later ``right_type`` event
    arrives, then emits with the match — the conversion-lag join where
    the future genuinely has to be awaited (the time-mirror of
    :func:`streaming_asof_prior`, whose state is three scalars; here
    state is the PENDING left events, bounded per user by the
    left-event rate x TTL).

    Emission contract (append mode): a left event emits exactly once —
    when its match arrives, or unmatched (null columns) when the
    ``state_ttl_ms`` timeout fires with no later right-type event
    seen. Without a TTL, unmatched lefts wait forever (set one in
    production). Within a micro-batch, matching follows the batch
    operator's ``(ts, event_id)`` order exactly; across batches it is
    as-of arrival, like every streaming twin here.
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
        _make_asof_next_fn(left_type, right_type, state_ttl_ms),
        ASOF_NEXT_OUTPUT_SCHEMA,
        ASOF_NEXT_STATE_SCHEMA,
        "append",
        timeout,
    )
