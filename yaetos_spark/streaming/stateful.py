"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.10); this is the
engine-native extension: per-key session state maintained across
micro-batches, the pattern a 100 TB event pipeline uses for online
sessionization.

Design note: sessions close when a LATER event for the key arrives
more than ``gap_seconds`` after the last one; the final open session
per key stays in state until the next batch (or forever on a quiet
key). Closing idle sessions via ProcessingTimeTimeout is the
production add-on, but on this Spark build a timeout registered under
``trigger(availableNow=True)`` makes the query loop timeout-check
batches without terminating — so the batch-drivable core uses
NoTimeout and state simply persists across availableNow runs through
the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_sec", T.LongType()),
        T.StructField("session_end_sec", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_sec", T.LongType()),
        T.StructField("last_sec", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def make_session_fn(gap_seconds: int = 1800):
    """Stateful sessionizer: events for a user extend the open session;
    an event more than ``gap_seconds`` after the previous one closes
    the session and emits it."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []
        secs = []
        for pdf in pdfs:
            secs.extend(int(v) for v in pdf["sec"])
        secs.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        for s in secs:
            if start is None:
                start, last, n = s, s, 1
            elif s - last > gap_seconds:
                out.append((user_id, start, last, n))
                start, last, n = s, s, 1
            else:
                last, n = s, n + 1
        if start is not None:
            state.update((start, last, n))
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_sec", "session_end_sec", "n_events"]
        )

    return fn


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id long, sec long) stream → closed-session rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_event_time_session_fn(gap_seconds: int = 1800):
    """Close-on-idle sessionizer: like ``make_session_fn`` but also
    registers an event-time timeout at ``last_event + gap``. When the
    stream's watermark passes that point the key fires with no data
    (``state.hasTimedOut``) and the open session is emitted + cleared —
    so quiet keys close as the rest of the stream progresses, without
    waiting for their own next event."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            out.append((user_id, start, last, n))
            state.remove()
        else:
            secs = []
            for pdf in pdfs:
                secs.extend(int(v) for v in pdf["sec"])
            secs.sort()
            start, last, n = state.get if state.exists else (None, None, 0)
            for s in secs:
                if start is None:
                    start, last, n = s, s, 1
                elif s - last > gap_seconds:
                    out.append((user_id, start, last, n))
                    start, last, n = s, s, 1
                else:
                    last, n = s, n + 1
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        yield pd.DataFrame(
            out, columns=["user_id", "session_start_sec", "session_end_sec", "n_events"]
        )

    return fn


def stateful_sessionize_event_time(
    events: DataFrame, gap_seconds: int = 1800, watermark_delay: str = "0 seconds"
) -> DataFrame:
    """events(user_id long, sec long) stream → closed-session rows,
    closing idle sessions via event-time timeout.

    Event-time (not processing-time) close is the replay-safe choice:
    re-running the pipeline over historical data produces identical
    sessions, and on this Spark build ProcessingTimeTimeout makes
    ``trigger(availableNow)`` loop timeout-check batches forever (see
    module docstring) while EventTimeTimeout terminates — expired
    timeouts fire in the no-data micro-batch Spark runs after the
    watermark advances, then the query stops.

    Scale: state is per-key and O(1); the watermark is global, so one
    straggler-free pass over a 100 TB replay closes every idle session
    without per-key polling.
    """
    with_ts = events.withColumn("ts", F.timestamp_seconds(F.col("sec"))).withWatermark(
        "ts", watermark_delay
    )
    return with_ts.groupBy("user_id").applyInPandasWithState(
        make_event_time_session_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
