"""Kafka source/sink tests — gated on connector availability (the test
container has no broker and no spark-sql-kafka package; on a cluster
with the connector these run for real)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.schemas import ELECTRONIC_ORDER
from confluent_kafka_streams_examples_spark.sources.kafka import (
    kafka_available,
    kafka_sink,
    kafka_stream,
)


def test_kafka_availability_probe(spark):
    assert kafka_available(spark) in (True, False)


def test_kafka_stream_gated(spark):
    if not kafka_available(spark):
        pytest.skip("spark-sql-kafka connector not on classpath")
    df = kafka_stream(spark, "orders", ELECTRONIC_ORDER)
    assert "order_id" in df.columns


def test_kafka_sink_serialization_projection(spark):
    """The sink's JSON serialization projection is pure DataFrame work —
    verify it batch-side without a broker: key cast to string, value is
    compact JSON of the selected columns (circe asJson.noSpaces parity)."""
    df = spark.createDataFrame(
        [("k1", "o1", 9.5)], ["key_col", "order_id", "price"]
    )
    out = df.select(
        F.col("key_col").cast("string").alias("key"),
        F.to_json(F.struct(F.col("order_id"), F.col("price"))).alias("value"),
    )
    row = out.collect()[0]
    assert row["key"] == "k1"
    assert row["value"] == '{"order_id":"o1","price":9.5}'


def test_kafka_wire_schema_contract(spark):
    """Broker-free contract test of the READ boundary: a batch frame
    with Kafka's exact wire schema (key/value BINARY, topic, partition
    INT, offset LONG, timestamp, timestampType) goes through the same
    deserialize_json projection kafka_stream applies — typed columns
    out, malformed payloads dropped, key cast to string."""
    import datetime as dt

    from confluent_kafka_streams_examples_spark.functions.json_serde import (
        deserialize_json,
    )

    wire_rows = [
        (
            b"user-1",
            b'{"order_id":"o1","user_id":"user-1","price":9.99,"quantity":2}',
            "electronic-orders",
            0,
            0,
            dt.datetime(2024, 1, 1),
            0,
        ),
        (
            b"user-2",
            b"not-json-at-all",  # malformed: must be dropped (circe parity)
            "electronic-orders",
            0,
            1,
            dt.datetime(2024, 1, 1),
            0,
        ),
    ]
    raw = spark.createDataFrame(
        wire_rows,
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    typed = deserialize_json(
        raw, "value", ELECTRONIC_ORDER, keep_cols=("key", "timestamp")
    ).withColumn("key", F.col("key").cast("string"))
    rows = typed.collect()
    assert len(rows) == 1
    assert rows[0]["key"] == "user-1"
    assert rows[0]["order_id"] == "o1"
    assert rows[0]["price"] == 9.99
