"""Python UDTF (U4 via the official table-function surface): DataFrame
API call and SQL LATERAL join."""

from __future__ import annotations

from confluent_kafka_streams_examples_spark.functions.udtf_fns import (
    TokenizeWithPositions,
    register_udtfs,
)


def test_udtf_direct_call(spark):
    from pyspark.sql import functions as F

    out = TokenizeWithPositions(F.lit("the quick brown")).collect()
    assert [(r["pos"], r["token"], r["is_long"]) for r in out] == [
        (0, "the", False),
        (1, "quick", True),
        (2, "brown", True),
    ]


def test_udtf_sql_lateral(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a bb"), (2, None)], "id int, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT id, t.pos, t.token
        FROM udtf_docs, LATERAL tokenize_pos(text) t
        ORDER BY id, t.pos
        """
    ).collect()
    # null text emits nothing (id=2 absent)
    assert [(r["id"], r["pos"], r["token"]) for r in rows] == [
        (1, 0, "a"),
        (1, 1, "bb"),
    ]
