"""Kafka source/sink (SURVEY.md §2.1 S1/S4).

The reference subscribes with ``builder.stream[K,V](topic)`` (reference
BasicStreams.scala:52) and writes with ``KStream.to(topic)``
(BasicStreams.scala:34).  Spark equivalents below.  The test container has
no Kafka broker and no spark-sql-kafka package, so these are exercised by
unit tests only for plan construction when the connector is available;
the file_stream source (sources.files) provides the streaming test path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from confluent_kafka_streams_examples_spark.functions.json_serde import deserialize_json


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka")  # noqa: B018 - probing format resolution
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    topic: str,
    schema: StructType,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
    key_deserializer: str = "string",
) -> DataFrame:
    """S1 — subscribe to a topic as a typed event stream.

    Kafka's native columns (key/value binary, topic, partition, offset,
    timestamp) are projected through the JSON serde boundary exactly as
    the reference's circe serde does (drop-malformed, circe.scala:15-23).
    Scale: ``minPartitions`` can oversplit busy topics; offsets checkpoint
    for exactly-once (stronger than the reference's at-least-once default).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    typed = deserialize_json(raw, "value", schema, keep_cols=("key", "timestamp"))
    return typed.withColumn("key", F.col("key").cast(key_deserializer))


def kafka_sink(
    df: DataFrame,
    topic: str,
    key_col: str,
    value_cols: list[str],
    bootstrap_servers: str = "localhost:9092",
    checkpoint_dir: str | None = None,
):
    """S4 — write a stream to a topic (reference KStream.to).

    Values serialize to compact JSON (circe ``asJson.noSpaces`` parity);
    returns the unstarted ``DataStreamWriter`` so callers control
    trigger/output-mode (lifecycle lives in streaming.lifecycle).
    """
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_cols])).alias("value"),
    )
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
