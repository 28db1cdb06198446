"""Property tests for the engine<->oracle determinism contract."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st


def py_round_det(x: float, p: int) -> float:
    """Python mirror of round_det / the SQL floor-form."""
    s = float(10**p)
    return math.floor(x * s + 0.5) / s


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=25, deadline=None)
def test_round_det_matches_sql_floor_form(xs):
    """floor(x*1e4+0.5)/1e4 computes identically in DuckDB and Python
    for any double — the portability property every ratio-rounding
    oracle relies on (plain ROUND disagrees between engines on decimal
    ties)."""
    con = duckdb.connect()
    for x in xs:
        got = con.execute("SELECT floor(? * 1e4 + 0.5) / 1e4", [x]).fetchone()[0]
        assert got == py_round_det(x, 4), x
    con.close()


@given(st.integers(min_value=0, max_value=2**48 - 1), st.integers(min_value=0, max_value=2**48 - 1))
@settings(max_examples=50, deadline=None)
def test_carter_wegman_no_overflow(h1, h2):
    """h1 + j*h2 for j<16 over 48-bit halves stays within int64 — the
    minhash permutation family's no-overflow invariant."""
    for j in range(16):
        v = h1 + j * h2
        assert v < 2**63


def test_md5_portability():
    """Spark, DuckDB, and Python md5 hex digests agree (the foundation
    of every hash-based oracle)."""
    import hashlib

    con = duckdb.connect()
    for s in ["", "a", "hello world", "p0-1", "0|the fast key"]:
        duck = con.execute("SELECT md5(?)", [s]).fetchone()[0]
        assert duck == hashlib.md5(s.encode()).hexdigest(), s
    con.close()


def test_round_det_spark_duckdb_parity(spark):
    """The Spark round_det expression and the oracle SQL floor form
    produce BIT-IDENTICAL doubles on a seeded batch including the
    decimal ties where plain ROUND diverges between engines."""
    import random

    from pyspark.sql import functions as F

    from confluent_kafka_streams_examples_spark.functions.scalar import round_det

    rng = random.Random(42)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(500)]
    vals += [0.11625, -0.11625, 2.675, -2.675, 0.5, -0.5, 0.00005, 1e-9, 0.0]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    spark_r = [r.r for r in sdf.select(round_det(F.col("x"), 4).alias("r")).collect()]
    con = duckdb.connect()
    duck_r = [
        row[0]
        for row in con.execute(
            "SELECT floor(x * 1e4 + 0.5) / 1e4 FROM (SELECT unnest(?) AS x)",
            [vals],
        ).fetchall()
    ]
    con.close()
    assert spark_r == duck_r


def test_hex_to_int_spark_duckdb_parity(spark):
    """Spark's conv(substring(md5(s), 1, 12), 16, 10) and the oracle's
    strpos-arithmetic hex parser produce identical integers — the
    foundation of every minhash/simhash/winnowing oracle."""
    from pyspark.sql import functions as F

    # the registry module must import first: queries_llm participates in
    # a registration cycle that only resolves through queries.py
    from confluent_kafka_streams_examples_spark import queries  # noqa: F401
    from confluent_kafka_streams_examples_spark.queries_llm import _hex_to_int_sql

    strs = [f"token-{i} with spaces and unicode £{i}" for i in range(200)] + [""]
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 12), 16, 10).cast("long")
    spark_r = [r.h for r in sdf.select(h.alias("h")).collect()]
    con = duckdb.connect()
    duck_r = [
        row[0]
        for row in con.execute(
            f"SELECT {_hex_to_int_sql('md5(s)', 1, 12)} FROM (SELECT unnest(?) AS s)",
            [strs],
        ).fetchall()
    ]
    con.close()
    assert spark_r == duck_r


_R5_QUERIES = [
    "dedup_duplicate_spans",
    "dedup_span_removal",
    "semdedup_prune",
    "similarity_pq_adc",
    "pq_recall_eval",
    "pipeline_training_export",
]


@pytest.mark.parametrize("name", _R5_QUERIES)
def test_round5_queries_shuffle_partition_invariant(spark, name):
    """Same-engine determinism the cross-engine oracle cannot witness:
    rerunning under a different shuffle partitioning (different
    summation orders, different window partition packing) must give the
    IDENTICAL row set — the integer-micronization / rounded-before-sum
    contracts at work."""
    from confluent_kafka_streams_examples_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows_3 = sorted(map(repr, QUERIES[name](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        rows_37 = sorted(map(repr, QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert rows_3 == rows_37
