"""End-to-end runs of the reference-example pipelines over streaming
file sources, re-creating each example's seeded generator expectations
(SURVEY §5)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from confluent_kafka_streams_examples_spark import examples
from tests.test_streaming import T0, ts

KV_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def run_to_memory(spark, df, tmp_path, mode):
    qname = f"e{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", f"{tmp_path}/ckpt_{qname}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {qname}").collect()


def test_basic_stream_pipeline_streaming(spark, tmp_path):
    """BasicStreams expectation: only orderNumber-suffixed values with
    id > 1000 survive (reference BasicStreams.scala:98: ~40% get the
    suffix; ids above/below threshold)."""
    src = str(tmp_path / "src")
    rows = [
        ("k1", "orderNumber-2001", ts(0)),
        ("k2", "orderNumber-999", ts(1)),   # below threshold
        ("k3", "plain-5000", ts(2)),        # no orderNumber prefix
        ("k4", "orderNumber-3000", ts(3)),
    ]
    spark.createDataFrame(rows, KV_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(KV_SCHEMA).parquet(src)
    out = run_to_memory(
        spark, examples.basic_stream_pipeline(stream), tmp_path, "append"
    )
    assert sorted(r["order_number"] for r in out) == [2001, 3000]


def test_ktable_pipeline_streaming(spark, tmp_path):
    """KTable expectation (reference KTableExample.scala:99-108): several
    records per key, only the LATEST counts; then the Basic filters."""
    src = str(tmp_path / "src")
    rows = [
        ("k1", "orderNumber-100", ts(0)),
        ("k1", "orderNumber-5000", ts(10)),  # latest for k1 -> passes
        ("k2", "orderNumber-7000", ts(0)),
        ("k2", "orderNumber-50", ts(10)),    # latest for k2 -> fails filter
    ]
    spark.createDataFrame(rows, KV_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(KV_SCHEMA).parquet(src)
    out = run_to_memory(
        spark,
        examples.ktable_pipeline(stream, "key", "ts", "value"),
        tmp_path,
        "update",
    )
    final = {r["key"]: r["order_number"] for r in out}
    assert final == {"k1": 5000}


ORDER_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("order_id", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def test_joins_pipeline_streaming(spark, tmp_path):
    """Joins expectation (reference JoinsExample.scala:150,176-178): pairs
    within the ±5s window join; the pair outside it does not."""
    ap, ep = str(tmp_path / "a"), str(tmp_path / "e")
    spark.createDataFrame(
        [("u1", "a1", ts(100)), ("u2", "a2", ts(200))], ORDER_SCHEMA
    ).coalesce(1).write.parquet(ap)
    spark.createDataFrame(
        [("u1", "e1", ts(103)), ("u2", "e2", ts(290))], ORDER_SCHEMA
    ).coalesce(1).write.parquet(ep)
    a = spark.readStream.schema(ORDER_SCHEMA).parquet(ap)
    e = spark.readStream.schema(ORDER_SCHEMA).parquet(ep)
    out = run_to_memory(
        spark, examples.joins_pipeline(a, e, "user_id", "ts", 5), tmp_path, "append"
    )
    assert [(r["appliance_order_id"], r["electronic_order_id"]) for r in out] == [
        ("a1", "e1")
    ]


PRICE_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("price", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def test_aggregation_pipeline_streaming(spark, tmp_path):
    """Aggregations expectation (reference AggregationsExample.scala:83-92):
    per-key totals of each key's prices, refined per update."""
    src = str(tmp_path / "src")
    rows = [(f"id-{k}", float(10 * (k + 1)), ts(i)) for k in range(3) for i in range(4)]
    spark.createDataFrame(rows, PRICE_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(PRICE_SCHEMA).parquet(src)
    out = run_to_memory(
        spark, examples.aggregation_pipeline(stream, "key", "price"), tmp_path, "update"
    )
    got = {r["key"]: r["total"] for r in out}
    assert got == {"id-0": 40.0, "id-1": 80.0, "id-2": 120.0}


def test_processor_pipeline_punctuate_reemission(spark, tmp_path):
    """A4 punctuate analog: with emit_every_ms set, a key re-emits its
    CURRENT total on timeout even when a later batch contains no rows
    for it (reference ProcessorApiExample.scala:43-58 forwards all
    stored totals every 10s of stream time)."""
    import time as _time

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", 5.0, ts(0))], PRICE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(PRICE_SCHEMA).parquet(src)
    totals = examples.processor_pipeline(stream, "key", "price", emit_every_ms=100)
    qname = f"p{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt_{qname}")
        .start()
    )
    # NOTE: processAllAvailable can NEVER be used with an armed
    # processing-time timeout — timers continuously schedule micro-batches
    # (that's the punctuator semantics), so "all available" never settles.
    # Poll the sink with deadlines instead.
    def poll(cond, seconds):
        deadline = _time.monotonic() + seconds
        while _time.monotonic() < deadline:
            rows = spark.sql(f"SELECT * FROM {qname}").collect()
            if cond(rows):
                return rows
            _time.sleep(0.5)
        return spark.sql(f"SELECT * FROM {qname}").collect()

    rows = []
    try:
        rows = poll(lambda rs: any(r["key"] == "a" for r in rs), 60)
        # a batch with data only for key b: key a must re-emit via timeout
        spark.createDataFrame([("b", 7.0, ts(1))], PRICE_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)
        rows = poll(lambda rs: len([r for r in rs if r["key"] == "a"]) >= 2, 60)
    finally:
        q.stop()
    emits_a = [r for r in rows if r["key"] == "a"]
    assert len(emits_a) >= 2, rows  # initial emit + timeout re-emit
    assert all(r["total"] == 5.0 for r in emits_a)
