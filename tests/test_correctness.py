"""Driver-mimicking gate: every registered query with an oracle must
match DuckDB at sf0.001 (fast path; the driver itself runs sf0.01)."""

from __future__ import annotations

import pytest

from confluent_kafka_streams_examples_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare(spark, name, QUERIES[name], ORACLES[name], SF_SMOKE)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_runs_rows_only(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
