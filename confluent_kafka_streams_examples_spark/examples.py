"""End-to-end streaming pipelines mirroring each reference example —
the engine's "program surface": each function wires source -> operators
-> sink exactly like the reference app's ``run`` (SURVEY §3.3), using
any streaming source (file stream in tests, Kafka in production).

Reference examples:
- BasicStreams.scala:33-60   -> basic_stream_pipeline
- KTableExample.scala:52-66  -> ktable_pipeline
- JoinsExample.scala:35-66   -> joins_pipeline
- AggregationsExample.scala:30-44 -> aggregation_pipeline
- ProcessorApiExample.scala:85-106 -> processor_pipeline
- ErrorHandlingExample.scala:78-92 -> (streaming/errors.DeadLetterPolicy
  + lifecycle.StreamApp; see tests/test_streaming_agg.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.functions.scalar import (
    safe_long,
    substr_after_first,
)
from confluent_kafka_streams_examples_spark.streaming.join import windowed_stream_join
from confluent_kafka_streams_examples_spark.streaming.ktable import latest_per_key_stream
from confluent_kafka_streams_examples_spark.streaming.processor import (
    running_total_with_emission,
)


def basic_stream_pipeline(stream: DataFrame, value_col: str = "value") -> DataFrame:
    """BasicStreams topology (reference BasicStreams.scala:51-60):
    filter contains 'orderNumber-' -> substring after first '-' ->
    cast long -> keep > 1000.  Works identically on batch and streaming
    DataFrames (same Catalyst plan)."""
    v = F.col(value_col)
    return (
        stream.filter(v.contains("orderNumber-"))
        .withColumn("order_number", safe_long(substr_after_first(v, "-")))
        .filter(F.col("order_number") > 1000)
    )


def ktable_pipeline(
    stream: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """KTableExample topology (reference KTableExample.scala:52-66):
    table source (latest per key) -> filter -> extract -> filter; emit
    as update-mode changelog (toStream)."""
    table = latest_per_key_stream(stream, key_col, ts_col, [value_col])
    v = F.col(value_col)
    return (
        table.filter(v.contains("orderNumber-"))
        .withColumn("order_number", safe_long(substr_after_first(v, "-")))
        .filter(F.col("order_number") > 1000)
    )


def joins_pipeline(
    appliance_stream: DataFrame,
    electronic_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 5,
) -> DataFrame:
    """JoinsExample topology (reference JoinsExample.scala:35-66):
    stream-stream inner join within ±window, zero grace; the combined
    record mirrors CombinedOrder.fromOrder (:263-272)."""
    joined = windowed_stream_join(
        appliance_stream, electronic_stream, key_col, ts_col, ts_col, window_seconds
    )
    return joined.select(
        F.col(f"l.{key_col}").alias("user_id"),
        F.col("l.order_id").alias("appliance_order_id"),
        F.col("r_order_id").alias("electronic_order_id"),
        F.greatest(F.col(f"l.{ts_col}"), F.col(f"r_{ts_col}")).alias("time"),
    )


def aggregation_pipeline(
    stream: DataFrame, key_col: str, price_col: str
) -> DataFrame:
    """AggregationsExample topology (reference
    AggregationsExample.scala:30-44): groupByKey -> running sum, emitted
    per update (use outputMode('update'))."""
    return stream.groupBy(key_col).agg(F.sum(price_col).alias("total"))


def processor_pipeline(
    stream: DataFrame, key_col: str, price_col: str, emit_every_ms: int | None = None
) -> DataFrame:
    """ProcessorApiExample topology (reference
    ProcessorApiExample.scala:85-106): source -> custom stateful
    processor (fold + optional punctuate-style re-emission) -> sink."""
    return running_total_with_emission(stream, key_col, price_col, emit_every_ms)
