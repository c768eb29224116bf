"""Unit tests for the scalar function surface (F2-F11) and sink builders."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from gmall2021_flink_dw_spark.functions.datetime import (
    derive_date_hour,
    epoch_millis_to_ts,
    format_datetime,
    parse_datetime,
    to_yyyymmdd,
    ts_to_epoch_millis,
)
from gmall2021_flink_dw_spark.functions.tokenizer import tokenize
from gmall2021_flink_dw_spark.streaming.sinks import (
    console_sink,
    kafka_dynamic_topic_sink,
    kafka_value_sink,
)
from gmall2021_flink_dw_spark.streaming.sources import stream_table


def test_datetime_roundtrip(spark):
    df = spark.createDataFrame(
        [("2024-03-05 14:30:45",)], "s string"
    ).select(
        parse_datetime("s").alias("ts")
    )
    row = df.select(
        format_datetime("ts").alias("fmt"),
        ts_to_epoch_millis("ts").alias("ms"),
        to_yyyymmdd("ts").alias("ymd"),
        *derive_date_hour("ts"),
    ).first()
    assert row.fmt == "2024-03-05 14:30:45"
    assert row.ymd == 20240305
    assert row.create_date == "2024-03-05"
    assert row.create_hour == 14
    back = (
        spark.createDataFrame([(row.ms,)], "ms long")
        .select(epoch_millis_to_ts("ms").alias("ts"))
        .first()
    )
    assert back.ts == datetime(2024, 3, 5, 14, 30, 45)


def test_tokenizer_edge_cases(spark):
    df = spark.createDataFrame(
        [("Hello, WORLD-42!",), ("",), (None,)], "text string"
    ).select(tokenize("text").alias("t"))
    rows = df.collect()
    assert rows[0].t == ["hello", "world", "42"]
    assert rows[1].t == []
    assert rows[2].t is None


def test_kafka_sink_builders_construct(spark):
    """No broker in the image: assert builders produce a configured
    DataStreamWriter with the right payload schema (start() untested)."""
    stream = stream_table(spark, "/root/testdata/sf0.001", "events")
    w1 = kafka_value_sink(stream, "t1", "broker:9092", "/tmp/ck1")
    assert w1 is not None
    routed = stream.withColumn("sink_table", F.lit("dwd_x"))
    w2 = kafka_dynamic_topic_sink(routed, "sink_table", "broker:9092", "/tmp/ck2")
    assert w2 is not None
    assert console_sink(stream) is not None
