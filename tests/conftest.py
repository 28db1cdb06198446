from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # smaller local parallelism for test latency

from confluent_kafka_streams_examples_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ckse-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
