"""Batch file sources (csv / json / parquet) with explicit schemas and
the PERMISSIVE / DROPMALFORMED / FAILFAST malformed-record triad —
the batch twin of the streaming dead-letter policy (E1/E4)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from confluent_kafka_streams_examples_spark.sources.files import batch_read

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("price", DoubleType()),
    ]
)


def _write_csv(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,price\n1,a,1.5\n2,b,2.5\nnot_a_number,c,3.5\n")
    return str(p)


def _write_jsonl(tmp_path):
    p = tmp_path / "data.json"
    p.write_text(
        '{"id": 1, "name": "a", "price": 1.5}\n'
        '{"id": 2, "name": "b", "price": 2.5}\n'
        "{broken json line\n"
    )
    return str(p)


def test_csv_permissive_with_corrupt_capture(spark, tmp_path):
    df = batch_read(
        spark, _write_csv(tmp_path), SCHEMA, "csv", corrupt_col="_raw"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["price"] == 1.5 and rows[1]["_raw"] is None
    bad = rows[None]
    assert bad["_raw"] is not None and "not_a_number" in bad["_raw"]


def test_csv_dropmalformed(spark, tmp_path):
    df = batch_read(spark, _write_csv(tmp_path), SCHEMA, "csv", mode="DROPMALFORMED")
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_jsonl_dropmalformed(spark, tmp_path):
    df = batch_read(spark, _write_jsonl(tmp_path), SCHEMA, "json", mode="DROPMALFORMED")
    got = sorted((r["id"], r["name"], r["price"]) for r in df.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_csv_failfast_raises(spark, tmp_path):
    df = batch_read(spark, _write_csv(tmp_path), SCHEMA, "csv", mode="FAILFAST")
    with pytest.raises(Exception):
        df.collect()


def test_unsupported_format(spark, tmp_path):
    with pytest.raises(ValueError):
        batch_read(spark, str(tmp_path), SCHEMA, "avro")


def test_write_sized_small_target_splits_files(spark, tmp_path):
    """REBALANCE + advisory size: a tiny advisory target must fan one
    logical partition out into multiple parquet files, and the hive
    variant must produce lang=... directories with data."""
    import pathlib

    from confluent_kafka_streams_examples_spark.sources.parquet import write_sized

    df = spark.range(0, 200_000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    flat = str(tmp_path / "flat")
    write_sized(df.coalesce(1), flat, target_file_mb=1)
    files = list(pathlib.Path(flat).glob("*.parquet"))
    assert len(files) > 1, files  # advisory 1MB split the single partition

    hive = str(tmp_path / "hive")
    write_sized(df, hive, target_file_mb=1, partition_by=["lang"])
    dirs = {p.name for p in pathlib.Path(hive).iterdir() if p.is_dir()}
    assert dirs == {"lang=0", "lang=1", "lang=2"}
    # partition pruning reaches the scan on read-back
    back = spark.read.parquet(hive).filter(F.col("lang") == "1")
    assert back.count() > 0
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # advisory conf restored
    assert spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None) in (None, "64MB", "64m")


def test_orc_roundtrip_with_pushdown_and_streaming(spark, tmp_path):
    """ORC as a first-class columnar source beside parquet: batch
    round-trip preserves values, a filter reaches the ORC scan as a
    pushed predicate with pruned columns, and the same directory reads
    as a STREAM (one microbatch per file set) — S1's source surface is
    format-plural, not parquet-only."""
    import uuid

    from confluent_kafka_streams_examples_spark.plans.describe import explain_str
    from confluent_kafka_streams_examples_spark.sources.files import file_stream

    rows = [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]
    p = str(tmp_path / "data_orc")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.format("orc").save(p)

    df = batch_read(spark, p, SCHEMA, fmt="orc")
    assert sorted(tuple(r) for r in df.collect()) == sorted(rows)

    plan = explain_str(df.filter(F.col("id") > 1).select("name"), "formatted")
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan, plan
    assert "ReadSchema: struct<id:bigint,name:string>" in plan, plan

    stream = file_stream(spark, p, SCHEMA, fmt="orc")
    qname = f"orc{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_orc")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {qname}").collect())
    assert got == sorted(rows)
