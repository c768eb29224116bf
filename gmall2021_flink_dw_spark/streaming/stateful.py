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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800
JUMP_TIMEOUT_S = 600

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

    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts_us", "event_id"])

    # Python row loop, deliberately: an ordered state-machine transition
    # per event cannot vectorize, and the iteration count is bounded by
    # ONE KEY's rows in ONE micro-batch (a handful at any realistic
    # per-user event rate) — not by partition or corpus size. Chunking/
    # multi-batch behavior is property-tested in
    # tests/test_state_machines.py.
    for ev_id, ts_us in zip(rows["event_id"], rows["ts_us"]):
        ts_us = int(ts_us)
        ev_id = int(ev_id)
        if pend_us is not None:
            if ts_us - pend_us > timeout_us:
                out.append((user_id, pend_event, pend_us))  # timeout bounce
            pend_us, pend_event = None, None
        is_entry = last_us is None or ts_us - last_us > gap_us
        if is_entry:
            pend_us, pend_event = ts_us, ev_id
        last_us = ts_us

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
    out: list[tuple[int, int, int, str]] = []
    # concat BEFORE sorting: a key's rows may span multiple Arrow chunks,
    # and per-chunk sorting would misplace the first-ever event
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    for ev_id, ts_us in zip(rows["event_id"], rows["ts_us"]):
        flag = "0" if seen else "1"
        seen = True
        out.append((user_id, int(ev_id), int(ts_us), flag))
    state.update((True,))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us", "is_new"])


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
    import datetime as _dt

    if state.hasTimedOut:
        # TTL expiry: watermark passed the stored day's end — drop state.
        state.remove()
        return

    day = state.get[0] if state.exists else None
    user_id = key[0]
    out: list[tuple[int, str, int, int, str]] = []
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    # per-key-per-batch row loop: bounded like _jump_fn's (see comment
    # there); day-transition logic is order-dependent by design
    for ev_id, ts_us, ev_type in zip(
        rows["event_id"], rows["ts_us"], rows["event_type"]
    ):
        ts_us = int(ts_us)
        d = ts_us - ts_us % _DAY_US
        if day is None or d != day:
            dt_str = _dt.datetime.fromtimestamp(
                d // 1_000_000, tz=_dt.timezone.utc
            ).strftime("%Y-%m-%d")
            out.append((user_id, dt_str, int(ev_id), ts_us, str(ev_type)))
            day = d
    state.update((day,))
    # event-time TTL: clear once the watermark passes the day's end
    state.setTimeoutTimestamp((day + _DAY_US) // 1000)
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "dt", "event_id", "ts_us", "event_type"]
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
