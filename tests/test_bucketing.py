"""Bucketed co-located joins (SURVEY M6 scale path).

At 100 TB the fact-fact joins (orders x lineitem) shuffle terabytes per
query unless both sides are bucketed on the join key at write time —
then every join on that key is Exchange-free forever. local[N] proves
the mechanism: write both tables bucketed by key, join, and assert the
physical plan contains a SortMergeJoin with NO shuffle exchange.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark):
    wh = tempfile.mkdtemp(prefix="bucketed_wh_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{wh}'")
    (
        load_table(spark, SF, "orders")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bktdb.orders_b")
    )
    (
        load_table(spark, SF, "lineitem")
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bktdb.lineitem_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS bktdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktdb.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bktdb")
    shutil.rmtree(wh, ignore_errors=True)


def _joined(spark):
    o = spark.table("bktdb.orders_b")
    l = spark.table("bktdb.lineitem_b")
    return o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("amount"),
    )


def test_bucketed_join_no_shuffle(bucketed):
    spark = bucketed
    df = _joined(spark)
    # read the static plan: AQE off (it hides join nodes pre-execution)
    # and auto-broadcast off (tiny sf0.001 tables would broadcast,
    # which is not the strategy under test — at real scale both sides
    # are far beyond any broadcast threshold)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # the whole point: bucket layout satisfies the join AND the groupBy
    # distribution, so the plan has NO shuffle exchange at all
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_unbucketed(bucketed):
    spark = bucketed
    got = _joined(spark)
    o = load_table(spark, SF, "orders")
    l = load_table(spark, SF, "lineitem")
    want = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("amount"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
