"""Join operators (SURVEY §2.4 J1-J5).

Parity targets:
- J1/J2 interval joins: Flink's ``intervalJoin`` buffers both keyed
  streams in state and emits pairs within event-time bounds
  (``OrderWideApp.java:77-85`` ±5 s; ``PaymentWideApp.java:78-86``
  [-15 min, +5 s]). Batch Spark form: equi-join on the key plus a range
  predicate — Catalyst plans one shuffle on the key and the range filter
  rides the join; no per-record state.
- J4 dimension enrichment: the reference does per-row async JDBC lookups
  against Phoenix with a Redis cache and a 6-12 thread pool
  (``DimAsyncFunction.java:28-53``, ``DimUtil.java:11-35``). Spark-first
  form: a chain of broadcast hash joins — the dim tables ship to every
  executor once per job instead of once per row over the network.
  Reference quirk: a missing dim id crashes the lookup future and the row
  is silently dropped (``DimUtil.java:27`` ``.get(0)`` on empty list).
  Default here is LEFT join (nulls for missing dims); ``drop_on_miss=True``
  replicates the reference (inner join).

Scale notes: the fact side keeps its partitioning through the whole dim
chain (broadcast joins are narrow); only the fact-fact interval join
shuffles, on the equi key. Skewed keys are handled by AQE skew-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: Column,
    left_ts: Column,
    right_ts: Column,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
) -> DataFrame:
    """J1/J2: equi-join on `key` keeping pairs with
    right_ts in [left_ts + lower_s, left_ts + upper_s] (bounds in seconds,
    negative lower = right may precede left). One shuffle on the key."""
    lo = int(lower_s * 1_000_000)
    hi = int(upper_s * 1_000_000)
    l_us = F.unix_micros(left_ts.cast("timestamp"))
    r_us = F.unix_micros(right_ts.cast("timestamp"))
    cond = key & (r_us >= l_us + lo) & (r_us <= l_us + hi)
    return left.join(right, cond, how)


def enrich_dims(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column]],
    drop_on_miss: bool = False,
) -> DataFrame:
    """J4: chain of broadcast dim joins. `dims` is [(dim_df, join_cond)].

    drop_on_miss=False (default): left joins, missing dims -> nulls.
    drop_on_miss=True: inner joins — reference-compat drop semantics.
    """
    how = "inner" if drop_on_miss else "left"
    out = fact
    for dim_df, cond in dims:
        out = out.join(F.broadcast(dim_df), cond, how)
    return out
