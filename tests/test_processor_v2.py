"""transformWithState (Spark 4 stateful-processor API) + RocksDB
state-store provider coverage.

Two independent axes:
- processor_v2: the new typed-state API.  Its Python runner needs
  ``google.protobuf`` (absent in this container) so EXECUTION is gated;
  plan construction is always asserted.
- RocksDB provider: JVM-side, works with the stable
  ``applyInPandasWithState`` path — exercised for real across batches,
  asserting both the fold result and that the state operator actually
  ran on RocksDB (rocksdb* custom metrics in query progress).
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from confluent_kafka_streams_examples_spark.streaming.processor import (
    running_total_with_emission,
)
from confluent_kafka_streams_examples_spark.streaming.processor_v2 import (
    ROCKSDB_PROVIDER,
    running_total_v2,
    transform_with_state_available,
)

T0 = dt.datetime(2024, 1, 1)

EVENT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_running_total_v2_plan_constructs(spark, tmp_path):
    """The transformWithStateInPandas plan must build (analysis passes,
    output schema as declared) even where the runtime is gated."""
    src = str(tmp_path / "src")
    write_batch(spark, src, [("a", 1.0, T0)])
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = running_total_v2(stream, "key", "value")
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["key", "total", "n"]


@pytest.mark.skipif(
    not transform_with_state_available(),
    reason="google.protobuf not installed — transformWithState runner cannot start",
)
def test_running_total_v2_executes(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(f"id-{k}", float(k + 1), T0) for k in range(3) for _ in range(4)]
    write_batch(spark, src, rows)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    out = running_total_v2(stream, "key", "value")
    qname = f"q{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["key"]: (r["total"], r["n"]) for r in spark.sql(f"SELECT * FROM {qname}").collect()}
    assert got == {f"id-{k}": (float((k + 1) * 4), 4) for k in range(3)}


def test_rocksdb_state_store_provider(spark, tmp_path):
    """U2 at scale: the same per-key fold, state hosted by the RocksDB
    provider (out-of-heap, incremental snapshots — the 100 TB key-space
    configuration).  Asserts continuity across batches AND that the
    state operator reports rocksdb metrics (i.e. the provider really
    was RocksDB, not the default HDFS-backed heap map)."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    src = str(tmp_path / "src")
    try:
        write_batch(spark, src, [("a", 1.0, T0), ("a", 2.0, T0), ("b", 5.0, T0)])
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        totals = running_total_with_emission(stream, "key", "value")
        qname = f"q{uuid.uuid4().hex[:8]}"
        q = (
            totals.writeStream.format("memory")
            .queryName(qname)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp_path}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
            write_batch(spark, src, [("a", 4.0, T0)])
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
        rows = spark.sql(f"SELECT * FROM {qname} ORDER BY key, n").collect()
        finals = {}
        for r in rows:
            finals[r["key"]] = (r["total"], r["n"])
        assert finals == {"a": (7.0, 3), "b": (5.0, 1)}
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any(k.startswith("rocksdb") for k in metrics), metrics
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
