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


# --------------------------------------------------------------------
# Bucketed-state variants (VERDICT r12 item 6).
#
# The per-key forms above call the state function once PER KEY per
# micro-batch; the r12 profile showed the residual cost is pure
# per-group framework overhead — Arrow round-trip, state-store
# get/commit, output-DataFrame ctor — ~1.3 ms/group, which at a
# 15k-key replay is ~20 s of overhead for ~0.1 s of kernel math. The
# variants below group by a HASH BUCKET of the key instead
# (pmod(xxhash64(user_id), n_buckets)), hold every bucket member's
# state in parallel sorted int64 arrays, and run the SAME vectorized
# state machines segment-wise across users — so framework overhead
# scales with n_buckets (a knob), not with the key count.
#
# Semantics preserved exactly (property-tested against the same batch
# oracles in tests/test_state_machines.py):
# - Per-key event-time timers become one per-bucket timer armed at the
#   MIN pending bound across members; when it fires (or on any data
#   call — timers must be re-armed on every invocation anyway), every
#   member whose own bound the CURRENT watermark has passed is flushed.
#   A member flushes in exactly the micro-batch cycle its per-key
#   timer would have fired in: both fire at the first batch whose
#   carried-in watermark passes the member's bound.
# - State TTL eviction (uv dedup) likewise drops exactly the members
#   whose day-end the watermark passed.
#
# At 100 TB the bucket id is the shuffle/state-store key: n_buckets
# scales with key cardinality (the knob below scales with input size),
# buckets stay O(keys/n_buckets) and spill-free, and the state store
# round-trips n_buckets rows per batch instead of n_keys. The
# trade-off is write amplification — one member's update rewrites the
# bucket row — which pays off exactly when per-group overhead
# dominates state size (the measured regime here: 8 state partitions
# beat 32 at sf0.1 AND 10x because state is small).
# Flink's analogous move is key-group assignment (keys hash into a
# fixed number of key groups, MAX_PARALLELISM, state tracked per
# group) — the reference inherits it implicitly via Flink's runtime.

# Measured sweep (uv dedup, solo min-of-3, r13): at 10x (15k keys)
# 16 buckets 6.5 s (parallelism-starved: fewer buckets than the ~32
# state-store partitions), 32: 5.3, 64: 4.7, 128: 4.7, 256: 5.3,
# 1024: 5.4 — per-group overhead creeps back as buckets grow; at
# sf0.1, 64: 2.78 vs 256: 3.08. 64 wins both scales on this box
# (local[32]); on a real cluster the knob scales with executor-core
# count and key cardinality — per-bucket state must stay
# O(keys/n_buckets) memory-bounded, which every kernel above is.
N_STATE_BUCKETS = 64


def _bucket_sorted_batch(
    pdfs: Iterator[pd.DataFrame], extra: tuple[str, ...] = ()
) -> tuple:
    """Concat a bucket's Arrow chunks and sort by (user_id, ts_us,
    event_id), returning int64 numpy arrays (uid, ts, ev, *extra).
    The user sort groups each member's rows into one contiguous
    segment so the per-key recurrences vectorize segment-wise."""
    chunks = list(pdfs)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    uid = rows["user_id"].to_numpy(np.int64)
    ts = rows["ts_us"].to_numpy(np.int64)
    ev = rows["event_id"].to_numpy(np.int64)
    order = np.lexsort((ev, ts, uid))
    cols = tuple(rows[c].to_numpy()[order] for c in extra)
    return (uid[order], ts[order], ev[order], *cols)


def _state_arrays(state: GroupState, n_cols: int) -> tuple:
    """Load a bucket's state as int64 arrays (users + n_cols-1 value
    columns), or empties when absent. users is sorted ascending and
    unique — the invariant every writer below maintains."""
    if state.exists:
        return tuple(np.asarray(c, dtype=np.int64) for c in state.get)
    return tuple(np.empty(0, dtype=np.int64) for _ in range(n_cols))


def _member_lookup(su: "np.ndarray", users: "np.ndarray") -> tuple:
    """(positions, found-mask) of `users` in the sorted state array."""
    if not len(su):
        return (
            np.zeros(len(users), dtype=np.int64),
            np.zeros(len(users), dtype=bool),
        )
    pos = np.minimum(np.searchsorted(su, users), len(su) - 1)
    return pos, su[pos] == users


def _merge_member_state(su, svals, bu, bvals):
    """Merge per-user state arrays: batch entries (bu, bvals) REPLACE
    state entries for the same user; both sides sorted unique; result
    sorted unique. svals/bvals are tuples of parallel arrays."""
    keep = ~np.isin(su, bu, assume_unique=True)
    u = np.concatenate([su[keep], bu])
    order = np.argsort(u, kind="stable")
    vals = tuple(
        np.concatenate([sv[keep], bv])[order]
        for sv, bv in zip(svals, bvals)
    )
    return u[order], vals


def _seg_bounds(uid: "np.ndarray") -> tuple:
    """(segment-start mask, segment-end mask) over user-sorted rows."""
    seg = np.empty(len(uid), dtype=bool)
    seg[0] = True
    seg[1:] = uid[1:] != uid[:-1]
    end = np.empty(len(uid), dtype=bool)
    end[:-1] = seg[1:]
    end[-1] = True
    return seg, end


UV_BUCKET_STATE = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("day_us", T.ArrayType(T.LongType())),
    ]
)


def _uv_bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Bucketed _uv_ttl_fn: state = (sorted member ids, last-emitted
    day per member). TTL eviction drops members whose day-end the
    watermark passed — on the timer AND on every data call (the timer
    must be re-armed per invocation anyway, so the data path is also a
    correct eviction point); emission semantics are the per-key
    kernel's, applied segment-wise."""
    wm_us = state.getCurrentWatermarkMs() * 1000
    su, sd = _state_arrays(state, 2)

    def _store(u, d):
        keep = d + _DAY_US > wm_us  # TTL: day-end already passed -> drop
        u, d = u[keep], d[keep]
        if len(u):
            state.update((u.tolist(), d.tolist()))
            # one timer at the min day-end; re-armed every invocation
            state.setTimeoutTimestamp(
                max((int(d.min()) + _DAY_US) // 1000, wm_us // 1000 + 1)
            )
        else:
            state.remove()

    if state.hasTimedOut:
        _store(su, sd)
        return

    uid, ts, ev, et = _bucket_sorted_batch(pdfs, ("event_type",))
    d = ts - ts % _DAY_US
    seg, end = _seg_bounds(uid)
    emit = seg.copy()
    emit[1:] |= d[1:] != d[:-1]
    # suppress each segment's first run when it equals the carried day
    first_idx = np.flatnonzero(seg)
    pos, found = _member_lookup(su, uid[first_idx])
    same_day = found & (sd[pos] == d[first_idx]) if len(su) else found
    emit[first_idx[same_day]] = False
    idx = np.flatnonzero(emit)

    new_u, (new_d,) = _merge_member_state(su, (sd,), uid[end], (d[end],))
    _store(new_u, new_d)
    if len(idx):
        d_emit = d[idx]
        yield pd.DataFrame(
            {
                "user_id": uid[idx],
                "dt": (d_emit // _DAY_US).astype("datetime64[D]").astype(str),
                "event_id": ev[idx],
                "ts_us": ts[idx],
                "event_type": et[idx],
            }
        )


NEW_USER_BUCKET_STATE = T.StructType(
    [T.StructField("users", T.ArrayType(T.LongType()))]
)


def _new_user_bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Bucketed _new_user_fn: state = sorted ids ever seen in this
    bucket. Unbounded by contract (the reference configures no TTL on
    this ValueState — BaseLogApp.java:55-77)."""
    (su,) = _state_arrays(state, 1)
    uid, ts, ev = _bucket_sorted_batch(pdfs)
    seg, _ = _seg_bounds(uid)
    first_idx = np.flatnonzero(seg)
    _, found = _member_lookup(su, uid[first_idx])
    flags = np.full(len(uid), "0", dtype=object)
    flags[first_idx[~found]] = "1"
    state.update((np.union1d(su, uid[first_idx]).tolist(),))
    yield pd.DataFrame(
        {"user_id": uid, "event_id": ev, "ts_us": ts, "is_new": flags}
    )


JUMP_BUCKET_STATE = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("last_us", T.ArrayType(T.LongType())),
        T.StructField("pend_us", T.ArrayType(T.LongType())),
        T.StructField("pend_event", T.ArrayType(T.LongType())),
    ]
)

_NO_PEND = -1  # array-state sentinel for "no pending entry"


def _jump_bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Bucketed _jump_fn: state = (sorted member ids, last event time,
    pending-entry time, pending-entry event) with _NO_PEND sentinels.
    The per-key recurrence already flattened (an entry either bounces
    against its successor gap or is discarded at the next event); here
    it runs segment-wise, and the watermark flush — per-key: one timer
    per key — is one bucket timer at the min pending bound plus a
    vectorized wm-passed sweep on every invocation."""
    gap_us = SESSION_GAP_S * 1_000_000
    timeout_us = JUMP_TIMEOUT_S * 1_000_000
    wm_ms = state.getCurrentWatermarkMs()
    su, sl, sp, spe = _state_arrays(state, 4)
    out_u: list = []
    out_e: list = []
    out_t: list = []

    def _flush_expired(u, l, p, pe):
        """Emit + clear every pending whose bound the watermark passed
        (keep last_us: the session context must survive — see the
        per-key kernel's timeout comment). The condition mirrors the
        per-key timer bound exactly — fires at (pend+timeout)//1000 + 1
        ms, STRICTLY after the boundary — so an on-time successor at
        ts == pend+timeout in a later micro-batch still cancels the
        bounce, matching the batch oracle's strict gap > timeout rule
        (ADVICE r13: `<=` at the exact boundary emitted a bounce the
        per-key layout would not)."""
        exp = (p != _NO_PEND) & ((p + timeout_us) // 1000 < wm_ms)
        if exp.any():
            out_u.append(u[exp])
            out_e.append(pe[exp])
            out_t.append(p[exp])
            p = np.where(exp, _NO_PEND, p)
            pe = np.where(exp, _NO_PEND, pe)
        return u, l, p, pe

    def _store(u, l, p, pe):
        if len(u):
            state.update((u.tolist(), l.tolist(), p.tolist(), pe.tolist()))
            pend = p != _NO_PEND
            if pend.any():
                state.setTimeoutTimestamp(
                    max(
                        (int(p[pend].min()) + timeout_us) // 1000 + 1,
                        wm_ms + 1,
                    )
                )
        else:
            state.remove()

    if state.hasTimedOut:
        _store(*_flush_expired(su, sl, sp, spe))
        if out_u:
            yield pd.DataFrame(
                {
                    "user_id": np.concatenate(out_u),
                    "event_id": np.concatenate(out_e),
                    "ts_us": np.concatenate(out_t),
                }
            )
        return

    uid, ts, ev = _bucket_sorted_batch(pdfs)
    seg, end = _seg_bounds(uid)
    first_idx = np.flatnonzero(seg)
    pos, found = _member_lookup(su, uid[first_idx])

    # carried-in last_us per segment (no state -> force row 0 an entry)
    prev = np.empty(len(ts), dtype=np.int64)
    prev[1:] = ts[:-1]
    carried_last = np.where(
        found, sl[pos] if len(su) else 0, ts[first_idx] - gap_us - 1
    )
    prev[first_idx] = carried_last
    is_entry = (ts - prev) > gap_us

    # carried-in pending vs each segment's first event (then cleared
    # either way — strict contiguity, exactly the per-key kernel)
    if len(su):
        carried_pend = np.where(found, sp[pos], _NO_PEND)
        carried_pe = np.where(found, spe[pos], _NO_PEND)
    else:
        carried_pend = np.full(len(first_idx), _NO_PEND, dtype=np.int64)
        carried_pe = carried_pend
    expired = (carried_pend != _NO_PEND) & (
        ts[first_idx] - carried_pend > timeout_us
    )
    if expired.any():
        out_u.append(uid[first_idx[expired]])
        out_e.append(carried_pe[expired])
        out_t.append(carried_pend[expired])

    # in-batch bounces: entries (not segment-last) whose successor gap
    # exceeds the jump timeout
    gap_next = np.empty(len(ts), dtype=np.int64)
    gap_next[:-1] = ts[1:] - ts[:-1]
    gap_next[-1] = 0
    inb = is_entry & ~end & (gap_next > timeout_us)
    if inb.any():
        out_u.append(uid[inb])
        out_e.append(ev[inb])
        out_t.append(ts[inb])

    # per-member carry-out: last event time; segment-last entries pend
    ent_end = is_entry[end]
    bu = uid[end]
    bl = ts[end]
    bp = np.where(ent_end, ts[end], _NO_PEND)
    bpe = np.where(ent_end, ev[end], _NO_PEND)
    u2, (l2, p2, pe2) = _merge_member_state(
        su, (sl, sp, spe), bu, (bl, bp, bpe)
    )
    # members without data this batch whose pending the watermark
    # passed flush NOW — the same micro-batch cycle their per-key
    # timer would have fired in (the timer is re-armed below anyway)
    _store(*_flush_expired(u2, l2, p2, pe2))

    if out_u:
        yield pd.DataFrame(
            {
                "user_id": np.concatenate(out_u),
                "event_id": np.concatenate(out_e),
                "ts_us": np.concatenate(out_t),
            }
        )


def _with_bucket(prepared: DataFrame, n_buckets: int) -> DataFrame:
    """Attach the state bucket id: pmod(xxhash64(user_id), n_buckets).
    xxhash64 (not raw modulo) so arithmetically-patterned key spaces
    still spread; pmod keeps the negative half in range."""
    return prepared.withColumn(
        "__bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    )


def uv_dedup_ttl_stream_bucketed(
    events: DataFrame,
    watermark: str = "0 seconds",
    n_buckets: int = N_STATE_BUCKETS,
) -> DataFrame:
    """uv_dedup_ttl_stream with bucketed state (see the section comment
    above): identical emitted set, framework overhead O(n_buckets)."""
    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "ts",
    )
    return _with_bucket(prepared, n_buckets).groupBy(
        "__bucket"
    ).applyInPandasWithState(
        _uv_bucket_fn,
        UV_SCHEMA,
        UV_BUCKET_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def correct_new_user_stream_bucketed(
    events: DataFrame, n_buckets: int = N_STATE_BUCKETS
) -> DataFrame:
    """correct_new_user_stream with bucketed state."""
    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return _with_bucket(prepared, n_buckets).groupBy(
        "__bucket"
    ).applyInPandasWithState(
        _new_user_bucket_fn,
        NEW_USER_SCHEMA,
        NEW_USER_BUCKET_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def jump_detect_stream_bucketed(
    events: DataFrame,
    watermark: str = "0 seconds",
    n_buckets: int = N_STATE_BUCKETS,
) -> DataFrame:
    """jump_detect_stream with bucketed state."""
    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "ts",
    )
    return _with_bucket(prepared, n_buckets).groupBy(
        "__bucket"
    ).applyInPandasWithState(
        _jump_bucket_fn,
        OUTPUT_SCHEMA,
        JUMP_BUCKET_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
