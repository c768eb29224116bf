"""RocksDB state store is active for stateful streaming (VERDICT r04
item 3).

The default HDFSBackedStateStoreProvider keeps all streaming state on
the JVM heap; at 100 TB the stateful family (uv dedup with 24h TTL, cdc
upsert, session windows) holds a state entry per key ever seen and dies
on heap. session.py pins Spark's in-box RocksDBStateStoreProvider with
changelog checkpointing; these tests assert the provider is genuinely
ACTIVE in executed stateful queries (rocksdb custom metrics present in
lastProgress), not merely configured, and that the stateful registered
queries stay oracle-green under it (tests/test_oracle_parity.py runs on
the same session fixture, so every streaming query in the registry is
re-proven under RocksDB each session).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.registry import load_all

REGISTRY = load_all()
UNIT_SF = "/root/testdata/sf0.001"


def test_provider_configured(spark):
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert "RocksDBStateStoreProvider" in provider, provider
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb"
            ".changelogCheckpointing.enabled"
        )
        == "true"
    )


def test_rocksdb_active_in_executed_stateful_query(spark, tmp_path):
    """Run a real stateful stream (streaming dropDuplicates — the same
    operator class as streaming_uv_dedup) and assert the LAST PROGRESS
    of the executed query reports rocksdb state-store metrics: the
    provider actually served the state, it wasn't just a conf string."""
    src = str(tmp_path / "src")
    spark.range(0, 1000).select(
        (F.col("id") % 50).cast("string").alias("k"), F.col("id")
    ).repartition(2).write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema("k string, id long")
        .parquet(src)
        .dropDuplicates(["k"])
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progresses, "no stateful progress recorded"
    metrics = progresses[-1]["stateOperators"][0]["customMetrics"]
    rocks_keys = [k for k in metrics if k.lower().startswith("rocksdb")]
    assert rocks_keys, f"no rocksdb metrics in state operator: {metrics}"


def test_stateful_registered_queries_green_under_rocksdb(spark):
    """The three stateful streaming shapes the verdict named, executed
    end-to-end on the RocksDB-provider session."""
    for name in (
        "streaming_uv_dedup",
        "streaming_cdc_upsert",
        "streaming_session_window",
    ):
        n = REGISTRY[name].fn(spark, UNIT_SF).count()
        assert n > 0, f"{name} returned no rows under RocksDB provider"
