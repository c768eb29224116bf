"""Bucketed co-located join: the shuffle-elimination story at 100 TB.

The big-join posture this engine documents everywhere (README §scale) is
"bucket the fact tables on the join key so repeated joins are
exchange-free". This test proves the claim mechanically: two tables
written with bucketBy on the join key, joined with broadcast disabled,
must plan a SortMergeJoin with ZERO Exchange operators — the bucketing
metadata replaces the shuffle. A third, non-bucketed copy of the same
join must show the Exchanges, so the assertion is about bucketing, not
about some session default.
"""

from __future__ import annotations

import uuid

import pytest

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.sources.batch import load_table
from tests.conftest import UNIT_SF


@pytest.fixture()
def no_broadcast(spark):
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE off so the compiled plan (what we assert on) is the final one
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_eliminates_exchange(spark, no_broadcast):
    suffix = uuid.uuid4().hex[:8]
    t_ord, t_li = f"b_ord_{suffix}", f"b_li_{suffix}"
    orders = load_table(spark, UNIT_SF, "orders")
    lineitem = load_table(spark, UNIT_SF, "lineitem")
    try:
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(t_ord)
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(t_li)
        )
        joined = (
            spark.table(t_ord)
            .join(
                spark.table(t_li),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # bucketing must remove BOTH join-side exchanges; the only
        # allowed Exchange is the one feeding the final aggregation
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, join_section
        # cross-check the result against the plain join
        plain = (
            orders.join(
                lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        # sanity: without bucketing the same join DOES shuffle both sides
        assert "Exchange hashpartitioning(o_orderkey" in plain_plan
        got = {(r.o_orderstatus, r.n) for r in joined.collect()}
        want = {(r.o_orderstatus, r.n) for r in plain.collect()}
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_ord}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


def test_day_partitioned_sink_prunes_on_read(spark, tmp_path):
    """The K3 sink layout (parquet partitioned by dt) must give readers
    partition PRUNING, not just organization: a dt-filtered read shows
    the predicate as a PartitionFilter on the scan and touches only the
    matching partition's files — the property that makes day-partitioned
    object storage queryable at 100 TB."""
    df = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0), ("2024-01-03", 4, 40.0)],
        "dt string, k long, v double",
    )
    out = str(tmp_path / "dws")
    df.write.partitionBy("dt").parquet(out)

    rd = spark.read.parquet(out).filter(F.col("dt") == "2024-01-02")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = rd._jdf.queryExecution().explainString(mode)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), f"dt not a partition filter:\n{plan[:1500]}"
    assert [r.k for r in rd.collect()] == [3]
    # runtime proof (inputFiles() reflects the PRE-pruning FileIndex, so
    # it can't be used here): the executed scan's own metrics must show
    # exactly one partition / file read
    scan = rd._jdf.queryExecution().executedPlan().collectLeaves().head()
    metrics = scan.metrics()
    assert metrics.apply("numPartitions").value() == 1
    assert metrics.apply("numFiles").value() >= 1
    assert metrics.apply("numOutputRows").value() == 1
