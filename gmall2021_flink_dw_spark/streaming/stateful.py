"""Custom stateful streaming operator: CEP-style bounce detection (W7).

The reference runs a Flink CEP NFA per device with strict contiguity and
a 10 s within-timeout, unioning the matched and timed-out side outputs
(``UserJumpDetailApp.java:77-134``). Spark has no CEP library; the
Spark-first realization is ``applyInPandasWithState``:

state per key = (last event time, pending entry event). On every event:
- a pending entry whose successor arrives later than `jump_timeout`
  is emitted as a bounce (the CEP timeout side-output);
- a pending entry with a successor inside the timeout is discarded
  (strict contiguity: the visit continued);
- an event starting a new session (gap > `session_gap`) becomes the new
  pending entry.
An event-time timer (watermark-driven) flushes a pending entry that
never sees a successor — the reference's `within(10s)` timeout.

The batch oracle is operators/cep.py::detect_jumps (lag/lead form);
tests/test_streaming.py asserts stream == batch on replay, mirroring how
the reference validates CEP against its inline transcript
(UserJumpDetailAppBak.java:28-43).

Note on transformWithStateInPandas (Spark 4's state-v2 API with native
value-state TTL): it would express the 24 h OnCreateAndWrite TTL of
UniqueVisitApp.java:51-53 directly, but its Python state server needs
google.protobuf, which is absent from this image (verified: the
streaming runner crashes with ImportError on init). The
applyInPandasWithState + event-time-timer forms below implement the
same TTL semantics on the v1 API, which has no such dependency.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800
JUMP_TIMEOUT_S = 600


def _sorted_key_batch(
    pdfs: Iterator[pd.DataFrame], extra: tuple[str, ...] = ()
) -> tuple:
    """Concat a key's Arrow chunks and sort by (ts_us, event_id),
    returning int64 numpy arrays (ts, ev, *extra columns). Chunks are
    arbitrary slices in arbitrary order (the `pdfs` iterator contract),
    so concat-then-sort is required before any order-dependent logic.
    numpy lexsort on the int64 columns instead of DataFrame.sort_values:
    at one-replayed-micro-batch scale the state function runs once per
    key, and sort_values' per-call overhead was 44% of the whole
    query's Python time (profiled r12, 15k keys at 10x)."""
    chunks = list(pdfs)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    ts = rows["ts_us"].to_numpy(np.int64)
    ev = rows["event_id"].to_numpy(np.int64)
    order = np.lexsort((ev, ts))
    cols = tuple(rows[c].to_numpy()[order] for c in extra)
    return (ts[order], ev[order], *cols)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("pend_us", T.LongType()),
        T.StructField("pend_event", T.LongType()),
    ]
)


def _jump_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_S * 1_000_000
    timeout_us = JUMP_TIMEOUT_S * 1_000_000
    user_id = key[0]

    if state.exists:
        last_us, pend_us, pend_event = state.get
    else:
        last_us, pend_us, pend_event = None, None, None

    out: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        # watermark passed pending+timeout with no successor -> bounce.
        # Keep the session context (last_us): dropping the whole state
        # here would make a later event arriving within session_gap of
        # the previous activity look like a fresh session entry — a
        # bounce the batch oracle never emits. No timer re-armed:
        # nothing is pending.
        if pend_us is not None:
            out.append((user_id, pend_event, pend_us))
        state.update((last_us, None, None))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us"])
        return

    ts, ev = _sorted_key_batch(pdfs)

    # Vectorized state-machine transition (was a per-row Python loop; at
    # one-micro-batch replay scale the per-group pandas overhead was 44%
    # sort + 28% output-ctor of the whole query's Python time — profiled
    # r12). The loop's recurrence flattens because `pend` never survives
    # past the NEXT event: an entry at i either bounces (successor gap >
    # timeout) or is discarded at i+1, so in-batch bounces = entries
    # whose successor gap exceeds the timeout; only the LAST row's entry
    # state carries out of the batch. Chunking/multi-batch equivalence
    # is property-tested in tests/test_state_machines.py.
    if len(ts):
        # prev gap: carry-in last_us for row 0 (None -> always an entry)
        prev = np.empty(len(ts), dtype=np.int64)
        prev[1:] = ts[:-1]
        prev[0] = last_us if last_us is not None else ts[0] - gap_us - 1
        is_entry = (ts - prev) > gap_us
        # carry-in pending from the previous batch: checked against the
        # first event of this batch, then cleared either way
        if pend_us is not None:
            if int(ts[0]) - pend_us > timeout_us:
                out.append((user_id, pend_event, pend_us))
            pend_us, pend_event = None, None
        # in-batch bounces: entry rows (except the last) whose successor
        # arrives later than the jump timeout
        if len(ts) > 1:
            bounce = is_entry[:-1] & ((ts[1:] - ts[:-1]) > timeout_us)
            for i in np.flatnonzero(bounce):
                out.append((user_id, int(ev[i]), int(ts[i])))
        if is_entry[-1]:
            pend_us, pend_event = int(ts[-1]), int(ev[-1])
        last_us = int(ts[-1])

    state.update((last_us, pend_us, pend_event))
    if pend_us is not None:
        # flush via event-time timer once the watermark passes the bound
        state.setTimeoutTimestamp((pend_us + timeout_us) // 1000 + 1)
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us"])


NEW_USER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("is_new", T.StringType()),
    ]
)
NEW_USER_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _new_user_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """W5/P11 streaming twin: per-key ValueState marks whether the key was
    ever seen; the first-ever event keeps is_new='1', every later one is
    rewritten to '0' (BaseLogApp.java:55-77 — unbounded ValueState, no
    TTL, matching the reference). Within a micro-batch rows are ordered
    by (ts, event_id) so replay matches the batch min-struct oracle."""
    seen = state.get[0] if state.exists else False
    user_id = key[0]
    # concat BEFORE sorting: a key's rows may span multiple Arrow chunks,
    # and per-chunk sorting would misplace the first-ever event
    ts, ev = _sorted_key_batch(pdfs)
    # vectorized: every row emits; only the first-ever row is '1'
    flags = np.full(len(ts), "0", dtype=object)
    if not seen and len(ts):
        flags[0] = "1"
    state.update((True,))
    yield pd.DataFrame(
        {
            "user_id": np.full(len(ts), user_id, dtype=np.int64),
            "event_id": ev,
            "ts_us": ts,
            "is_new": flags,
        }
    )


_DAY_US = 86_400 * 1_000_000

UV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("dt", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)
UV_STATE = T.StructType([T.StructField("day_us", T.LongType())])


def _uv_ttl_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """W4 with state TTL (UniqueVisitApp.java:43-78): per-key ValueState
    holds the UTC day already emitted; the first event of a new day
    passes the filter. The reference configures a 24 h OnCreateAndWrite
    TTL on that state (UniqueVisitApp.java:51-53); here the event-time
    timer set to the stored day's end clears the state once the
    watermark passes it — same bound (<= 24 h after write), and exactly
    when the value can no longer affect emission (any later event is a
    different day and emits regardless). Keeps streaming state O(active
    keys within 24 h), not O(all keys ever)."""
    if state.hasTimedOut:
        # TTL expiry: watermark passed the stored day's end — drop state.
        state.remove()
        return

    day0 = state.get[0] if state.exists else None
    user_id = key[0]
    ts, ev, et = _sorted_key_batch(pdfs, ("event_type",))
    # Vectorized day-transition (was a per-row loop; same profiling
    # motivation as _jump_fn). After the sort, the UTC day is monotone
    # non-decreasing within the batch, so the loop's "emit when d !=
    # current day" rule reduces to: emit the first row of each distinct-
    # day run, except a first run equal to the carried-in state day.
    # Consecutive runs always differ, so no other run can be suppressed.
    d = ts - ts % _DAY_US
    emit = np.empty(len(d), dtype=bool)
    emit[0] = day0 is None or int(d[0]) != day0
    emit[1:] = d[1:] != d[:-1]
    idx = np.flatnonzero(emit)
    state.update((int(d[-1]),))
    # event-time TTL: clear once the watermark passes the day's end
    state.setTimeoutTimestamp((int(d[-1]) + _DAY_US) // 1000)
    if len(idx):
        d_emit = d[idx]
        yield pd.DataFrame(
            {
                "user_id": np.full(len(idx), user_id, dtype=np.int64),
                "dt": (d_emit // _DAY_US).astype("datetime64[D]").astype(str),
                "event_id": ev[idx],
                "ts_us": ts[idx],
                "event_type": et[idx],
            }
        )


def uv_dedup_ttl_stream(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """W4 streaming twin with per-key 24 h state TTL. `events` needs
    (user_id, event_id, ts, event_type). Emission is immediate (first
    event of each (key, day)), so on in-order replay the emitted set
    equals the batch row_number oracle exactly; the timer only bounds
    state size."""
    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _uv_ttl_fn,
        UV_SCHEMA,
        UV_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def correct_new_user_stream(events: DataFrame) -> DataFrame:
    """W5 streaming form of operators/dedup.py::correct_new_user_flag.
    `events` needs (user_id, event_id, ts). No timeout: the reference
    keeps this state forever (no TTL configured on the ValueState)."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _new_user_fn,
        NEW_USER_SCHEMA,
        NEW_USER_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def jump_detect_stream(events: DataFrame, watermark: str = "0 seconds") -> DataFrame:
    """W7 streaming twin. `events` needs (user_id, event_id, ts)."""
    prepared = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "ts",
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _jump_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
