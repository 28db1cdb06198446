"""Skew/bucketing tooling: correctness of salted two-phase ops and the
exchange-free plan guarantee for bucketed joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.operators.skew import (
    bucketed_table,
    keyless_band_pairs,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from confluent_kafka_streams_examples_spark.plans.describe import explain_str


def _herd(spark):
    """Thundering-herd fixture: 300 events inside ONE 1-second cell
    (every pair qualifies at window=1s -> a quadratic hot bucket), plus
    500 background events spaced 3 s apart (no pairs)."""
    hot = spark.range(0, 300).select(
        F.col("id"),
        (F.lit(5_000_000) + (F.col("id") * 3333) % 1_000_000).alias("t"),
    )
    bg = spark.range(1000, 1500).select(
        F.col("id"), (F.col("id") * 3_000_000).alias("t")
    )
    return hot.unionByName(bg)


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


def test_keyless_band_join_salt_invariant_on_herd(spark):
    """The salted keyless band join must return EXACTLY the unsalted
    result on the thundering-herd fixture — same pairs, same per-event
    degree (hot events see all 299 peers, background events none)."""
    e = _herd(spark)

    def degrees(pairs):
        return {
            r["a_id"]: r["n"]
            for r in pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    plain = degrees(keyless_band_pairs(e, "id", "t", window=1_000_000))
    salted = degrees(
        keyless_band_pairs(e, "id", "t", window=1_000_000, salt_buckets=8)
    )
    assert plain == salted
    assert set(plain.values()) == {299} and len(plain) == 300


def test_keyless_band_join_salt_bounds_hot_bucket(spark):
    """The salt must actually split the hot cell: with S=8, the largest
    (bucket, salt) build-side group holds ~n_hot/S rows (asserted at
    <= 2x the uniform share — xxhash64 splits ids near-uniformly),
    where the unsalted hot bucket holds all 300.  The salted plan joins
    on (bucket, salt) with no cartesian anywhere."""
    import math

    e = _herd(spark)
    S = 8
    # mirror of the operator's documented build-side key derivation
    build_keys = e.select(
        F.floor(F.col("t") / F.lit(1_000_000)).cast("long").alias("bucket"),
        F.pmod(F.xxhash64("id"), F.lit(S)).alias("salt"),
    )
    sizes = [
        r["n"]
        for r in build_keys.groupBy("bucket", "salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert max(sizes) <= 2 * math.ceil(300 / S), sizes

    p = explain_str(
        keyless_band_pairs(e, "id", "t", window=1_000_000, salt_buckets=S),
        "simple",
    )
    assert "_salt" in p, p
    assert "CartesianProduct" not in p, p


def test_keyless_band_join_build_side_never_broadcasts(spark):
    """The band join's build side is the full event stream —
    corpus-linear, never a broadcast candidate — and must stay pinned
    shuffle-hash even at test scale where a size estimate would allow
    broadcast.  (Un-pinned, AQE converted the build side to broadcast
    off its COMPRESSED shuffle bytes at the 100x-density probe and
    OOM'd the driver building the ~10x-larger in-memory relation.)"""
    e = _herd(spark)
    pairs = keyless_band_pairs(e, "id", "t", window=1_000_000).select(
        "a_id", "b_id"
    )
    # collect() drives THIS DataFrame's own QueryExecution, so the
    # inspected adaptive plan is the FINAL one (a noop write would
    # execute a separate QueryExecution and leave this plan unexecuted
    # with isFinalPlan=false — asserting nothing about AQE's choice)
    assert len(pairs.collect()) > 0
    executed = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed
    assert "ShuffledHashJoin" in executed, executed
    assert "BroadcastHashJoin" not in executed, executed


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
