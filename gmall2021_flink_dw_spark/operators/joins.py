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


def asof_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
    version_cols: Sequence[str],
) -> DataFrame:
    """As-of join: attach the latest version row with
    version_ts <= fact_ts per key. Spark has no native as-of join; the
    scale-correct composition is a UNION of both keyed timelines + one
    window pass (last non-null carried forward) — a single shuffle on
    the key, never a per-fact range scan. This is the versioned-dim
    (SCD2 / CDC history) lookup the reference approximates with
    Phoenix point queries (DimUtil.java:23-26) but with time travel.

    facts keep all their columns; version payload columns arrive as
    `version_cols` (null when no version precedes the fact).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    def order_key(df: DataFrame, col: str) -> Column:
        # microsecond-precise ordering for timestamp columns (a plain
        # cast('long') truncates to whole seconds, losing sub-second
        # order between a version and a fact in the same second);
        # numeric columns pass through unchanged.
        dt = df.schema[col].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return F.unix_micros(F.col(col).cast("timestamp"))
        return F.col(col).cast("long")

    # Scale design: the window pass (the one wide stage) shuffles ONLY
    # the distinct (key, ts) fact timeline + the version rows — never
    # the fact payload. The as-of value depends only on (key, ts), so
    # resolving per distinct pair is lossless; the resolved lookup is
    # then equi-joined back to the facts (AQE broadcasts it when small,
    # so wide facts often avoid shuffling entirely).
    f_keys = (
        facts.select(
            F.col(key).alias("__k"), order_key(facts, fact_ts).alias("__ts")
        )
        .distinct()
        .withColumn("__is_fact", F.lit(1))
    )
    timeline = f_keys.select(
        "__k",
        "__ts",
        "__is_fact",
        *[
            F.lit(None).cast(versions.schema[c].dataType).alias(f"__v_{c}")
            for c in version_cols
        ],
    ).unionByName(
        versions.select(
            F.col(key).alias("__k"),
            order_key(versions, version_ts).alias("__ts"),
            F.lit(0).alias("__is_fact"),
            *[F.col(c).alias(f"__v_{c}") for c in version_cols],
        )
    )
    # versions sort before facts at equal ts (__is_fact ascending) so a
    # version effective exactly at fact_ts is visible to that fact.
    w = Window.partitionBy("__k").orderBy("__ts", "__is_fact").rowsBetween(
        Window.unboundedPreceding, 0
    )
    resolved = (
        timeline.select(
            "__k",
            "__ts",
            "__is_fact",
            *[
                F.last(F.col(f"__v_{c}"), ignorenulls=True)
                .over(w)
                .alias(f"__vc_{c}")
                for c in version_cols
            ],
        )
        .filter(F.col("__is_fact") == 1)
        .drop("__is_fact")
    )
    joined = facts.join(
        resolved,
        F.col(key).eqNullSafe(F.col("__k"))
        & order_key(facts, fact_ts).eqNullSafe(F.col("__ts")),
    )
    return joined.select(
        *[F.col(c) for c in facts.columns],
        *[F.col(f"__vc_{c}").alias(c) for c in version_cols],
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant two-phase aggregation: pre-aggregate on
    (keys, salt) so one hot key spreads over `salt_buckets` partial
    groups, then merge partials per key. Only valid for decomposable
    aggregates (sum/count/min/max) — the caller supplies the PARTIAL
    expressions in `aggs` and the merge is a SUM-like re-aggregate of
    the same column names (sum of sums, sum of counts, min of mins...).

    `aggs` maps output column name -> (partial_expr, merge_fn_name).
    """
    # any row->bucket spread works: the merge phase is exact, so the
    # final result is salt-independent. monotonically_increasing_id is
    # the cheapest row-local spread (no hashing of possibly-long keys).
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    partial_exprs = [expr.alias(name) for name, (expr, _m) in aggs.items()]
    pre = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
    )
    merge_exprs = []
    for name, (_e, merge) in aggs.items():
        merge_exprs.append(getattr(F, merge)(name).alias(name))
    return pre.groupBy(*keys).agg(*merge_exprs)


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
