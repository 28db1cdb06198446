"""Delta-style MERGE emulation (operators/merge.py): clause semantics
on small fixtures — update/delete/insert paths, conditions, first-
clause-wins ordering, target-schema preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.operators.merge import (
    merge_into,
    touched_partitions,
)


def _tables(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, name string, bal double"
    )
    source = spark.createDataFrame(
        [(2, 5.0), (3, 100.0), (4, 7.0)], "id int, delta double"
    )
    return target, source


def test_merge_update_insert_keep(spark):
    target, source = _tables(spark)
    out = merge_into(
        target,
        source,
        on="id",
        matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        insert_values={
            "id": F.col("s.id"),
            "name": F.lit("new"),
            "bal": F.col("s.delta"),
        },
    )
    assert out.columns == ["id", "name", "bal"]
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0),   # target-only: kept unchanged
        2: ("b", 25.0),   # matched: updated
        3: ("c", 130.0),  # matched: updated
        4: ("new", 7.0),  # source-only: inserted
    }


def test_merge_delete_wins_over_update(spark):
    """Delete clause (listed first) claims matched rows before update —
    Delta's first-matching-clause semantics."""
    target, source = _tables(spark)
    out = merge_into(
        target,
        source,
        on="id",
        matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        matched_delete_condition=F.col("s.delta") < 10,
        insert_values=None,
    )
    got = {r["id"]: r["bal"] for r in out.collect()}
    # id=2 (delta 5) deleted; id=3 updated; id=1 kept; id=4 not inserted
    assert got == {1: 10.0, 3: 130.0}


def test_merge_conditional_update_and_insert(spark):
    target, source = _tables(spark)
    out = merge_into(
        target,
        source,
        on="id",
        matched_update={"bal": F.lit(0.0)},
        matched_update_condition=F.col("s.delta") > 50,
        insert_values={"id": F.col("s.id"), "name": F.lit("n"), "bal": F.col("s.delta")},
        insert_condition=F.col("s.delta") > 100,
    )
    got = {r["id"]: r["bal"] for r in out.collect()}
    # only id=3 passes the update condition; id=4 fails insert condition
    assert got == {1: 10.0, 2: 20.0, 3: 0.0}


def test_merge_no_clauses_is_identity(spark):
    target, source = _tables(spark)
    out = merge_into(target, source, on="id", insert_values=None)
    got = sorted((r["id"], r["bal"]) for r in out.collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_touched_partitions(spark):
    _, source = _tables(spark)
    vals = sorted(r["id"] for r in touched_partitions(source, "id").collect())
    assert vals == [2, 3, 4]
