"""Epoch-scoped persist reclamation (ADVICE r03: persist() leak).

Operators persist shared intermediates (shingle tables, signatures,
tokenized docs) that must survive until the query's result is consumed
— but no longer. The registry wraps every query entry to open a new
cache epoch, so a long session running many queries (the driver's
50-query correctness gate) holds at most one query's cached blocks at
a time instead of accumulating all of them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark import cache
from gmall2021_flink_dw_spark.registry import load_all

REGISTRY = load_all()


def test_tracked_persist_reclaimed_on_next_epoch(spark):
    df1 = spark.range(100).withColumn("x", F.col("id") * 2)
    cache.open_cache_epoch()
    cache.tracked_persist(df1)
    df1.count()
    assert df1.storageLevel.useMemory, "df1 should be persisted"
    cache.open_cache_epoch()
    assert not df1.storageLevel.useMemory, "df1 should be reclaimed"
    assert not cache._epoch()


def test_query_sequence_does_not_accumulate_cache(spark):
    """Run two persist-heavy registered queries back to back and consume
    their results; after a third query entry opens its epoch, the cached
    RDDs of the first two must be gone (at most the last query's blocks
    remain tracked)."""
    sf = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    REGISTRY["dedup_minhash_lsh"].fn(spark, sf).count()
    n_after_first = len(cache._epoch())
    assert n_after_first >= 1, "minhash should track persists"
    REGISTRY["dedup_simhash"].fn(spark, sf).count()
    REGISTRY["text_stats"].fn(spark, sf).count()
    # text_stats persists nothing; its epoch reclaimed simhash's blocks
    assert not cache._epoch()
    jsc = spark.sparkContext._jsc.sc()
    n_cached = jsc.getPersistentRDDs().size()
    assert n_cached == 0, f"{n_cached} RDDs still cached after 3 queries"


def test_epochs_are_thread_scoped(spark):
    """ADVICE r04: a second driver thread opening its own epoch must not
    reclaim another thread's in-flight persists."""
    import threading

    df1 = spark.range(50).withColumn("x", F.col("id") + 1)
    cache.open_cache_epoch()
    cache.tracked_persist(df1)
    df1.count()
    assert df1.storageLevel.useMemory

    def other():
        cache.open_cache_epoch()
        df2 = spark.range(10).withColumn("y", F.col("id") * 3)
        cache.tracked_persist(df2)
        df2.count()
        cache.open_cache_epoch()  # reclaims only this thread's blocks

    t = threading.Thread(target=other)
    t.start(); t.join()
    assert df1.storageLevel.useMemory, (
        "another thread's epoch must not reclaim this thread's persists"
    )
    cache.open_cache_epoch()
    assert not df1.storageLevel.useMemory
