"""Epoch-scoped persist tracking (ADVICE r03: persist() leak).

Several operators persist a shared intermediate (tokenized documents,
shingle tables, simhash signatures) that two branches of the same query
reuse — the right call on a cluster, where the alternative is computing
the tokenizer twice. But `unpersist()` inside the query builder would
fire before the lazy plan executes, so nothing ever unpersisted, and in
a long session running all 100 queries (the driver's correctness gate)
the cached blocks accumulated; only bench.py's clearCache between
passes bounded them.

The fix is scoping, not eagerness: every registered query entry point
opens a new *cache epoch* (registry.py wraps each QueryFn); persists
registered through :func:`tracked_persist` belong to the current epoch
and are unpersisted when the NEXT epoch opens — by which point the
previous query's result has been consumed (the driver, bench, and the
parity tests all materialize each result before invoking the next
query). Non-blocking unpersist: Spark drops the blocks in the
background; executors never stall on reclamation.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# Epochs are keyed by driver thread (ADVICE r04): Spark supports
# concurrent jobs from multiple driver threads, and a single global list
# would let a query running on thread B unpersist thread A's in-flight
# intermediates (correct results — unpersist only forces recompute — but
# the persist optimization silently disappears). Per-thread epochs make
# concurrent drivers independent; the serial consume-before-next-call
# contract still applies WITHIN a thread. Re-entrancy (a registered
# query invoking another registered entry mid-build) remains unsupported
# by design: the inner entry would reclaim the outer's persists.
_EPOCHS: dict[int, list[DataFrame]] = {}
_LOCK = threading.Lock()


def _epoch() -> list[DataFrame]:
    with _LOCK:
        return _EPOCHS.setdefault(threading.get_ident(), [])


def open_cache_epoch() -> None:
    """Reclaim this thread's previous query invocation's tracked
    persists. Called by the registry wrapper on every query entry; safe
    to call at any query boundary."""
    epoch = _epoch()
    while epoch:
        df = epoch.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to reclaim


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() whose lifetime is the current thread's query epoch."""
    _epoch().append(df.persist())
    return df
