"""SparkSession factory.

The reference pins parallelism to 1 to match Kafka partitions
(``ProductStatsApp.java:39``); we instead size shuffle parallelism to the
machine and let AQE coalesce at runtime. Session timezone is pinned to UTC
so timestamp formatting matches the DuckDB oracle (whose timestamps are
UTC-naive); the reference's fixed +08:00 handling (``DateTimeUtil.java:17``)
is a per-query formatting concern, not a session one.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_PKG_ZIP: str | None = None


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Queries that run Python UDF stages (pandas UDFs / mapInPandas) pickle
    functions by module reference; a driver process started outside the
    repo directory would otherwise hit ModuleNotFoundError in the worker.
    Idempotent per process; cheap (small zip, cached by Spark).
    """
    global _PKG_ZIP
    if _PKG_ZIP is None:
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        # per-process archive name: a shared fixed path lets two
        # concurrent drivers (bench + pytest) overwrite the zip while
        # another context is shipping it to executors.
        base = os.path.join(
            tempfile.gettempdir(), f"gmall2021_flink_dw_spark_pkg_{os.getpid()}"
        )
        _PKG_ZIP = shutil.make_archive(base, "zip", os.path.dirname(pkg_dir),
                                       os.path.basename(pkg_dir))
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        # already added in this context — Spark raises on re-add of the
        # same filename in some versions; safe to ignore.
        pass


def get_spark(
    app_name: str = "gmall2021_flink_dw_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-oriented defaults.

    Defaults chosen for a large cluster and equally valid on local[N]:
    AQE on (runtime partition coalescing + skew-join splitting), Arrow on
    (vectorized pandas-UDF exchange), shuffle partitions ~ cores locally
    (on a real cluster this is set per-job to ~2-3x total cores).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # many distinct queries per session -> many generated classes; the
        # default 240m JIT code cache fills and triggers multi-second
        # deopt/flush stalls on later queries (observed in bench runs).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # Shuffle files are reclaimed by the ContextCleaner only when
        # the driver GCs the RDDs that own them; with a 48g heap a long
        # suite barely GCs and dead shuffle files accumulate on local
        # disk (the default periodic-GC safety net is 30min — a 2-pass
        # 100x suite filled the disk mid-run before this, r12-ext).
        # 5min keeps the backlog bounded at a negligible GC cost.
        .config("spark.cleaner.periodicGC.interval", "5min")
        # parquet TIMESTAMP (isAdjustedToUTC=false) -> TIMESTAMP_NTZ, matching
        # DuckDB's naive reading of the driver-generated testdata.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # events.parquet stores ts as TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long nanos and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # RocksDB state store (VERDICT r04 item 3): the default provider
        # keeps ALL streaming state on the JVM heap — at 100 TB the
        # stateful queries (uv dedup TTL, cdc upsert, session windows)
        # hold state for every key ever seen and heap state is the #1
        # streaming scale killer. Spark's in-box RocksDB provider spills
        # to local disk with bounded memory; changelog checkpointing
        # uploads only per-batch deltas instead of full SST snapshots.
        # (The reference has nothing here: its Flink jobs run heap state
        # with checkpointing commented out, UserJumpDetailApp.java:37-44.)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled",
            "true",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
