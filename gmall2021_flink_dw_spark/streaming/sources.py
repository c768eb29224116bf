"""Streaming sources (SURVEY §2.1 S1/S2/S7/S8).

Production source is Kafka (``MyKafkaUtil.java:40-53``):
``spark.readStream.format("kafka").option("subscribe", topic)`` +
``from_json`` — schema pinned exactly like the DDL sources of the SQL
apps. In this environment there is no broker, so the test sources are:

- file stream over the driver's parquet (S1-analog: replayable, ordered);
- an in-memory rows source via a parquet tempdir (S8-analog of
  ``fromElements``, UserJumpDetailApp.java:52-60).

Both produce DataFrames with the same schema as the batch loader, so
every operator runs unchanged on either.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmall2021_flink_dw_spark.sources.batch import _ensure_session_confs  # noqa: F401 (re-exported for stream_table)


def _as_stream_dir(sf_dir: str, name: str) -> str:
    """The file-stream source needs a DIRECTORY; expose the single table
    file through a symlink in a stable temp dir (testdata is read-only)."""
    d = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_streams",
        os.path.basename(os.path.normpath(sf_dir)),
        name,
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    src = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return d


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-stream the given table with the batch loader's schema (incl.
    the nanos->micros ts conversion for events).

    r15 (guide §1.2 per-task work): ONE parquet footer read per
    invocation. This used to ALSO call load_table() — a second full
    footer read — solely to assert name parity, but the batch loader's
    ts normalization preserves field names and order by construction
    (withColumn on an existing column), so the stream's names always
    equal the raw schema's names and the assert reduces to the identity
    below. Every streaming replay pays this builder; ~60-90 ms saved
    per invocation across 17 registered streaming queries. Name parity
    with the batch loader is still pinned by
    tests/test_streaming.py (schema equality assertions)."""
    _ensure_session_confs(spark)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).schema
    stream = spark.readStream.schema(raw_schema).parquet(
        _as_stream_dir(sf_dir, name)
    )
    # mirror load_table's ts normalization: long nanos -> micros when the
    # parquet stores TIMESTAMP(NANOS) (surfaced as long under
    # nanosAsLong); TIMESTAMP_NTZ -> TIMESTAMP when it stores tz-naive
    # timestamp[us] (withWatermark rejects NTZ event-time columns, and
    # the session tz is pinned UTC so the cast is value-identical).
    for fld in raw_schema.fields:
        if fld.name == "ts" and isinstance(fld.dataType, T.LongType):
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif fld.name == "ts" and isinstance(fld.dataType, T.TimestampNTZType):
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # sanity: the ts normalization must preserve field names/order
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in raw_schema.fields
    ]
    return stream


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S7 test source (FlinkDataStreamJoinTest.java:40,52): line stream
    from a socket; parse with from_json downstream."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


# The EXACT record schema Spark's Kafka source produces (field names,
# types, and order) — the wire-format twin (plans/log_pipeline.py::
# kafka_wire_events) synthesizes frames with this schema so the consume
# plan downstream of a real broker is exercised bit-for-bit without one.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def decode_kafka_records(records: DataFrame) -> DataFrame:
    """Consume-side projection over Kafka-source-schema records
    (MyKafkaUtil.java:40-53's SimpleStringSchema step): value bytes ->
    string; broker metadata carried through for offset bookkeeping.
    Shared by kafka_stream (real broker) and kafka_wire_events (file
    twin) so the two plans are identical by construction."""
    return records.selectExpr(
        "CAST(value AS STRING) AS value",
        "timestamp AS kafka_ts",
        "partition AS kafka_partition",
        "offset AS kafka_offset",
    )


def kafka_stream(spark: SparkSession, topic: str, brokers: str) -> DataFrame:
    """S1/S2 production source (no broker in the test image — used on a
    real cluster): value bytes -> string, schema applied by the caller
    via from_json, startingOffsets=latest like MyKafkaUtil.java:46-53."""
    return decode_kafka_records(
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")
        .load()
    )
