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

from pyspark.sql import DataFrame

_CURRENT_EPOCH: list[DataFrame] = []


def open_cache_epoch() -> None:
    """Reclaim the previous query invocation's tracked persists. Called
    by the registry wrapper on every query entry; safe to call at any
    query boundary."""
    while _CURRENT_EPOCH:
        df = _CURRENT_EPOCH.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to reclaim


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() whose lifetime is the current query epoch."""
    _CURRENT_EPOCH.append(df.persist())
    return df
