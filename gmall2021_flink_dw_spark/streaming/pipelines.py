"""Streaming pipelines: the batch operators run under Structured Streaming.

Design rule (SURVEY §7): every operator is a pure DataFrame -> DataFrame
transform; streaming adds only `withWatermark` before stateful stages and
a sink. The transforms here are used verbatim by both the batch
equivalence tests and the streaming queries.

Parity map:
- W1/W2 watermarks  -> withWatermark (bounded out-of-orderness)
- W3 tumbling agg   -> groupBy(window(...)) in append mode
- W4 UV dedup       -> dropDuplicates([key, day]) with watermark
- K1/K3 sinks       -> memory sink (tests) / parquet partitioned-by-day
                       (ClickHouse-table analog, toYYYYMMDD partitioning)
- K2/K4 dynamic routing -> foreachBatch fan-out writer
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gmall2021_flink_dw_spark.functions.windows import FMT


def visitor_stats_transform(df: DataFrame, window_s: int = 3600) -> DataFrame:
    """A2/W3 streaming-safe visitor stats: per (window, event_type)
    pv count + exact decimal dur_sum + approx uv (HLL — streaming cannot
    do exact COUNT(DISTINCT) in append mode; SURVEY 'hardest items')."""
    return (
        df.groupBy(F.window("ts", f"{window_s} seconds"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("pv_ct"),
            F.approx_count_distinct("user_id").alias("uv_ct_approx"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("dur_sum"),
        )
        .select(
            F.date_format("window.start", FMT).alias("stt"),
            F.date_format("window.end", FMT).alias("edt"),
            "event_type",
            "pv_ct",
            "uv_ct_approx",
            "dur_sum",
        )
    )


def uv_dedup_transform(df: DataFrame) -> DataFrame:
    """W4 streaming dedup: first event per (user, day). In streaming the
    watermark bounds state (the reference bounds it with a 24 h state
    TTL, UniqueVisitApp.java:51-53)."""
    return df.withColumn("dt", F.to_date("ts")).dropDuplicates(
        ["user_id", "dt"]
    )


def product_stats_transform(df: DataFrame, window_s: int = 3600) -> DataFrame:
    """A1/A3 streaming EXACT distinct-in-window (SURVEY 'hardest items'):
    append-mode streaming cannot run COUNT(DISTINCT), so the reference's
    HashSet-union accumulator (ProductStats.java:74-84, merged in the
    window reduce ProductStatsApp.java:213-238) is re-expressed as
    collect_set inside the windowed aggregation — the set lives in the
    state store until the watermark closes the window, then size() is
    the exact distinct count. Scale note: state per group is O(distinct
    keys in window); the HLL path (visitor_stats_transform /
    dws_product_stats_approx) is the bounded-memory variant for keys
    whose per-window cardinality is unbounded at 100 TB."""
    return (
        df.groupBy(F.window("ts", f"{window_s} seconds"), "event_type")
        .agg(
            F.size(F.collect_set("user_id")).alias("user_ct"),
            F.count(F.lit(1)).alias("pv_ct"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("amount"),
        )
        .select(
            F.date_format("window.start", FMT).alias("stt"),
            F.date_format("window.end", FMT).alias("edt"),
            "event_type",
            "user_ct",
            "pv_ct",
            "amount",
        )
    )


_MEMORY_CKPTS: list[str] = []


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    final_flush: bool = True,
) -> StreamingQuery:
    """K5/test sink: memory table + synchronous drain.

    The checkpoint goes under scratch.stream_scratch_base() (r14):
    without an explicit location Spark creates the temp checkpoint under
    java.io.tmpdir, whose per-batch WAL/commit fsyncs cost ~1 s of pure
    latency per replay on this box's ext4 /tmp (see scratch.py). Same
    reclaim-at-next-call lifecycle as the topic scratch dirs.

    final_flush=False (r15, guide §1/§2 — measure first, then remove
    the pass): skip the trailing NO-DATA micro-batch
    (spark.sql.streaming.noDataMicroBatches.enabled=false, cloned into
    the query's own conf at start and restored immediately after).
    Only callers whose OUTPUT provably never depends on that trigger
    may pass it — i.e. queries that emit on data (inner stream-stream
    joins, immediate-emission stateful kernels whose timers only evict
    state); watermark-CLOSURE queries (append-mode windows, CEP timer
    flush) need the no-data batch to emit their final windows and must
    keep the default. The skipped batch is pure replay scaffolding:
    it re-commits every state store (and re-invokes the Python kernel
    per bucket for timer-bearing operators) to produce zero rows —
    measured 0.68-0.70x solo on uv_dedup/interval_join at sf0.1. On a
    real cluster the equivalent no-data triggers amortize across the
    job's lifetime instead of being ~1/2 of a two-trigger replay."""
    import atexit
    import shutil
    import tempfile

    from gmall2021_flink_dw_spark.scratch import stream_scratch_base

    for stale in list(_MEMORY_CKPTS):
        shutil.rmtree(stale, ignore_errors=True)
        _MEMORY_CKPTS.remove(stale)
    ckpt = tempfile.mkdtemp(prefix=f"memckpt_{name}_", dir=stream_scratch_base())
    _MEMORY_CKPTS.append(ckpt)
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    spark = stream_df.sparkSession
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    orig = spark.conf.get(conf_key, "true")
    if not final_flush:
        spark.conf.set(conf_key, "false")
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
    finally:
        if not final_flush:
            # the query captured a CLONED conf at start; restoring here
            # cannot re-enable no-data batches for the running query
            spark.conf.set(conf_key, orig)
    q.processAllAvailable()
    return q


def write_dws_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """K3 sink analog: the reference appends DWS rows to ClickHouse
    tables partitioned by toYYYYMMDD(stt) (ProductStatsApp.java:337-339).
    Spark form: parquet/Delta append partitioned by the day of stt —
    idempotent via checkpointing (W9 exactly-once analog: checkpoint +
    deterministic file naming per epoch)."""
    q = (
        stream_df.withColumn("dt", F.substring("stt", 1, 10))
        # Cluster by the partition key before the partitioned sink
        # (guide §6): without this every state-store task writes a file
        # into every day directory it touches (~tasks x days tiny
        # files); repartition("dt") routes each day to one writer task
        # -> ~one file per day per micro-batch, and the read-back scan
        # pays file-count ~ days, not tasks x days. Same fix a real
        # ClickHouse/lake sink needs at 100 TB.
        .repartition(F.col("dt"))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("dt")
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_router(base_dir: str):
    """K2/K4 dynamic multi-sink: one micro-batch fanned out to per-
    sink_table directories (the reference picks the Kafka topic / Phoenix
    table per record: MyKafkaUtil.java:27-35, DimSinkFunction.java:40-71).

    partitionBy(sink_table) writes every route in ONE pass over the
    batch — no per-route filter-and-write loop, no repeated scan.
    mode("overwrite") scoped to the epoch directory is what makes the
    sink exactly-once (W9): a retried micro-batch rewrites epoch=N
    in place instead of appending a duplicate copy — the idempotent
    foreachBatch pattern the checkpoint's replay contract requires."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy("sink_table")
            .parquet(os.path.join(base_dir, f"epoch={epoch_id}"))
        )

    return _write


def dynamic_foreach_batch_router(base_dir: str, config_provider):
    """W6 dynamic broadcast-state refresh: the reference streams
    table_process rule CHANGES into a broadcast state, so routing reacts
    mid-job (BaseDBApp.java:74-98, TableProcessFunction.java:49-63). In
    micro-batch Spark the equivalent is re-resolving the config at every
    batch boundary: `config_provider(spark)` is called per epoch and its
    (tiny) result broadcast-joined against the batch — a rule change
    takes effect at the next micro-batch, the same granularity at which
    the reference's broadcast state becomes visible to all tasks. The
    config source can be a JDBC table, a CDC snapshot, or any
    DataFrame-producing callable; no restart, no re-deploy."""
    from gmall2021_flink_dw_spark.operators.routing import route

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        cfg = config_provider(batch_df.sparkSession)
        routed = route(batch_df, cfg)
        (
            routed.write.mode("overwrite")
            .parquet(os.path.join(base_dir, f"epoch={epoch_id}"))
        )

    return _write
