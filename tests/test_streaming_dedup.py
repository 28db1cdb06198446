"""Streaming dedup (exactly-once on at-least-once delivery) and the
foreachBatch + MERGE upsert sink (changelog stream maintaining a
parquet snapshot — the batch-MERGE operator composed into streaming).
"""

from __future__ import annotations

import datetime as dt
import uuid

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from confluent_kafka_streams_examples_spark.operators.merge import merge_into
from confluent_kafka_streams_examples_spark.streaming.dedup import (
    dedup_exact_keys,
    dedup_within_watermark,
)

T0 = dt.datetime(2024, 1, 1)

SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_dedup_within_watermark_drops_redelivery(spark, tmp_path):
    """Duplicate business keys within the watermark horizon are dropped
    — across micro-batches, and regardless of their (differing)
    redelivery timestamps."""
    src = str(tmp_path / "src")
    write_batch(spark, src, [("a", 1.0, ts(0)), ("a", 1.0, ts(1))])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = dedup_within_watermark(stream, ["key"], "ts", "10 minutes")
    qname = f"q{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
        # next micro-batch: 'a' re-delivered again (new ts), 'b' is new
        write_batch(spark, src, [("a", 1.0, ts(2)), ("b", 5.0, ts(3))])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT key, count(*) AS n FROM {qname} GROUP BY key").collect()
    got = {r["key"]: r["n"] for r in rows}
    assert got == {"a": 1, "b": 1}


def test_dedup_exact_keys_batch_equivalence(spark):
    df = spark.createDataFrame(
        [("a", 1.0, ts(0)), ("a", 1.0, ts(0)), ("b", 2.0, ts(1))], SCHEMA
    )
    assert dedup_exact_keys(df, ["key"]).count() == 2


def test_foreachbatch_merge_maintains_snapshot(spark, tmp_path):
    """The KTable-maintenance pattern without a transactional format:
    each micro-batch of changes MERGEs into the latest parquet snapshot
    and writes the next snapshot version (version-per-batch = poor
    man's Delta commit log; checkpoint makes it effectively-once)."""
    src = str(tmp_path / "src")
    snap_root = tmp_path / "snap"
    snap_root.mkdir()
    # v0 snapshot
    spark.createDataFrame(
        [("a", 10.0, ts(0)), ("b", 20.0, ts(0))], SCHEMA
    ).select("key", "value").write.parquet(str(snap_root / "v0"))

    versions = ["v0"]

    def apply_changes(batch_df, batch_id):
        current = spark.read.parquet(str(snap_root / versions[-1]))
        changes = batch_df.select("key", "value").dropDuplicates(["key"])
        merged = merge_into(
            current,
            changes,
            on="key",
            matched_update={"value": F.col("s.value")},
            insert_values={"key": F.col("s.key"), "value": F.col("s.value")},
        )
        nxt = f"v{len(versions)}"
        merged.write.parquet(str(snap_root / nxt))
        versions.append(nxt)

    write_batch(spark, src, [("a", 11.0, ts(1)), ("c", 30.0, ts(2))])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream.writeStream.foreachBatch(apply_changes)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = spark.read.parquet(str(snap_root / versions[-1]))
    got = {r["key"]: r["value"] for r in final.collect()}
    assert got == {"a": 11.0, "b": 20.0, "c": 30.0}


def test_dedup_random_stream_matches_batch_distinct(spark, tmp_path):
    """Differential for the dedup pillar: a seeded random in-order
    stream with heavy re-delivery (every key drawn from a small pool,
    re-deliveries inside the watermark horizon) must emit exactly the
    batch DISTINCT of the union — each business key once, regardless
    of how arrivals slice into micro-batches."""
    import random
    import uuid

    from tests.test_streaming import EVENT_SCHEMA, ts, write_batch

    rng = random.Random(13)
    batches, t = [], 0
    for _ in range(3):
        b = []
        for _ in range(200):
            t += rng.randrange(2)  # slow clock: all dups in-horizon
            b.append((f"k{rng.randrange(40)}", 1.0, ts(t)))
        batches.append(b)

    src = str(tmp_path / "src")
    write_batch(spark, src, batches[0])
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    from confluent_kafka_streams_examples_spark.streaming.dedup import (
        dedup_within_watermark,
    )

    deduped = dedup_within_watermark(stream, ["key"], "ts", delay="1 hour")
    qname = f"dd{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            write_batch(spark, src, b)
            q.processAllAvailable()
    finally:
        q.stop()
    got = [r["key"] for r in spark.sql(f"SELECT key FROM {qname}").collect()]
    expect = {k for b in batches for k, _, _ in b}
    assert sorted(got) == sorted(expect)  # once each, no omissions
