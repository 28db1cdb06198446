"""Skew/bucketing tooling: correctness of salted two-phase ops and the
exchange-free plan guarantee for bucketed joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.operators.skew import (
    bucketed_table,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from confluent_kafka_streams_examples_spark.plans.describe import explain_str


def test_salted_aggregate_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    plain = {
        (r["k"]): (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["total"], r["n"], r["mx"])
        for r in salted_aggregate(
            df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = spark.range(0, 5000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (99, "zz")], ["k", "name"])
    plain = sorted((r["v"], r["name"]) for r in big.join(small, "k").collect())
    salted = sorted((r["v"], r["name"]) for r in salted_join(big, small, "k").collect())
    assert plain == salted


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the same key join WITHOUT an Exchange —
    the pre-planned co-location that replaces repeated shuffles at
    100 TB."""
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed(a, "bt_a", "k", buckets=8)
    write_bucketed(b, "bt_b", "k", buckets=8)
    try:
        # force sort-merge (tiny test tables would otherwise broadcast)
        # to expose the property that matters at scale: NO shuffle
        # exchange on either side of the join
        joined = (
            bucketed_table(spark, "bt_a")
            .hint("merge")
            .join(bucketed_table(spark, "bt_b"), "k")
        )
        p = explain_str(joined)
        assert "hashpartitioning" not in p, p
        assert "SortMergeJoin" in p, p
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_salted_join_rejects_small_side_preserving_how(spark):
    big = spark.range(10).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "a"), (99, "zz")], ["k", "name"])
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="right")


def test_write_bucketed_overwrites_orphaned_location(spark):
    """A managed-table location left on disk by a dead session (the
    catalog no longer knows the table) must not fail the next
    write_bucketed with LOCATION_ALREADY_EXISTS — the driver runs every
    query in a fresh session against a warehouse dir that may hold
    leftovers."""
    import os
    import pathlib

    from confluent_kafka_streams_examples_spark.operators.skew import write_bucketed

    name = "bt_orphan"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = pathlib.Path(wh) / name
    orphan.mkdir(parents=True, exist_ok=True)
    (orphan / "stale.parquet").write_text("not a real parquet file")
    try:
        df = spark.range(100).select((F.col("id") % 7).alias("k"), "id")
        write_bucketed(df, name, "k", buckets=4)
        assert spark.table(name).count() == 100
        # at most one file per bucket (empty buckets write none): the
        # aligned-repartition guarantee — without it each task writes a
        # file per bucket it touches
        files = [f for f in os.listdir(orphan) if f.startswith("part-")]
        assert 1 <= len(files) <= 4, files
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
