"""Event sessionization: session-window aggregation in batch, and the same
semantics as a CUSTOM STATEFUL STREAMING operator via applyInPandasWithState.

The reference has no session concept (Solr is stateless per request); this
is the training-pipeline/eventstream operator a 100 TB stack needs: group a
clickstream into per-user sessions split at inactivity gaps. Two paths
share one spec, cross-tested in tests/test_sessions.py:

1. ``sessionize`` — batch, pure built-ins: ``F.session_window`` (Spark's
   native merging session windows). This is the oracle-checked path
   (DuckDB gaps-and-islands twin, registry ``s03_user_sessions``).
2. ``sessionize_stream`` — Structured Streaming, applyInPandasWithState:
   per-user GroupState carries the open session across micro-batches and
   CLOSED sessions are emitted as soon as an event lands >= gap after the
   previous one. Output for already-closed sessions is IDENTICAL to the
   batch path; each user's final (still-open) session stays in state until
   more data arrives — exactly the semantics of an unbounded stream.

Session boundary spec (matches Spark's session_window, verified in
tests/test_sessions.py): an event extends the current session iff
``ts <= last_ts + gap`` — an event at EXACTLY the gap still merges (Spark
merges touching [t, t+gap] ranges); only ``ts > last_ts + gap`` starts a
new session. The DuckDB oracle therefore breaks on ``ts - lag(ts) >
gap``, not ``>=``. All epoch math is floor-to-second in UTC (the
session factory pins spark.sql.session.timeZone=UTC).

Scale shape: batch is one shuffle on user_id with Spark's native session
merge; streaming state is O(open sessions) = O(distinct active users),
partitioned by user_id across executors — no skew beyond a single user's
event rate, and the per-batch kernel sorts only that batch's rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SESSION_SCHEMA = (
    "user_id long, session_start_s long, n_events long, "
    "total_value double, duration_s long"
)


def sessionize(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Per-user session aggregate via F.session_window (batch).

    Returns (user_id, session_start_s, n_events, total_value, duration_s)
    with epoch seconds floored, matching the DuckDB gaps-and-islands
    oracle bit-for-bit."""
    # fractional interval strings ("30.0 minutes") parse to NULL windows
    # and silently drop every row — always feed integer seconds
    gap = f"{int(round(gap_minutes * 60))} seconds"
    return (
        events.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.unix_timestamp(F.min("ts")).alias("session_start_s"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .alias("duration_s"),
        )
        .select("user_id", "session_start_s", "n_events", "total_value",
                "duration_s")
    )


def sessionize_stream(events_stream: DataFrame,
                      gap_minutes: float = 30.0) -> DataFrame:
    """Stateful-streaming twin: emits each CLOSED session once.

    State per user = the open session (start, last, n, total) as epoch
    floats; a batch's rows are sorted by (ts, event_id) inside the kernel
    so retries are deterministic. NoTimeout: a session closes only when a
    later event proves the gap — the open tail emits when further data
    (or a caller-injected sentinel event) arrives, never speculatively.

    Ordering contract: closed sessions match the batch path exactly when
    each user's events arrive in event-time order ACROSS micro-batches
    (within a batch the kernel sorts). An event that arrives late —
    earlier than state's ``last`` — is folded into the open session
    (counts/total, start lowered) without moving ``last`` backwards, so
    late data can never split a session or produce negative durations;
    with real out-of-order sources, prefer a watermarked native
    ``F.session_window`` aggregation instead."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = float(gap_minutes) * 60.0

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = []
        for ts, val in zip(batch["ts"], batch["value"]):
            t = ts.timestamp()
            if last is not None and t - last > gap_s:
                out.append((uid, int(start), n, round(total, 4),
                            int(last) - int(start)))
                start, last, n, total = t, t, 1, float(val)
            else:
                start = t if start is None else min(start, t)
                last = t if last is None else max(last, t)
                n, total = n + 1, total + float(val)
        state.update((start, last, n, total))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start_s", "n_events",
                              "total_value", "duration_s"])

    return (
        events_stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start double, last double, n long, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
