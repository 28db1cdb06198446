"""Processor-API parity on Spark 4's ``transformWithStateInPandas``.

Same reference semantics as ``processor.py`` (ProcessorApiExample.scala:
34-72 — per-key running total in a persistent KeyValueStore, :60-67),
re-expressed on the *new* stateful-processor API:

- ``StatefulProcessor.init`` receives a handle and declares typed state
  (the ``KeyValueStore`` analog — ValueState/ListState/MapState);
- ``handleInputRows`` is ``process()`` (fold rows into state, emit);
- state lives in the **RocksDB state-store provider** (required by this
  API) — the 100 TB path: per-key state is out-of-heap, incrementally
  checkpointed via changelog, and bounded by optional TTL instead of
  growing forever.

Why keep both implementations: ``applyInPandasWithState`` is the stable
widely-deployed API (processor.py); ``transformWithState`` adds typed
state primitives, per-state TTL, and RocksDB-only operation.  The engine
exposes the same running-total surface on both so either can back A2-A4.

Environment status (re-checked round 9, exhaustively): ``google.
protobuf`` is absent from every Python environment on the machine
(pyenv site-packages, miniconda, bundled wheels — searched), package
installs are disallowed, and vendoring was evaluated and REJECTED:
the protobuf runtime is a large third-party package whose wholesale
copy into this repo would be exactly the kind of code import the
project forbids, and a hand-written ``google.protobuf`` shim cannot
satisfy the transformWithState Python runner (it loads generated
``*_pb2`` descriptors and speaks length-prefixed protobuf frames to
the JVM state server — not a stubbable surface).  The execution tests
therefore stay plan-construction-gated
(``transform_with_state_available``), and the high-key-cardinality
throughput problem transformWithState would have addressed is solved
instead by the BUCKETED applyInPandasWithState folds
(streaming/funnel.py, streaming/processor.py — measured flat to 10M
keys in SCALE.md).  On any standard PySpark 4 deployment (where
protobuf ships with the Spark Connect/streaming extras) the gated
tests run as-is — nothing here is stubbed around the dependency; only
query START is conditional.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """The transformWithState Python runner speaks protobuf to the JVM
    state server; without the ``google.protobuf`` package the query
    plan CONSTRUCTS but the runner crashes at start.  Gate execution
    (same pattern as the Kafka connector gate in sources/kafka.py)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total", DoubleType()),
        StructField("n", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("total", DoubleType()), StructField("n", LongType())]
)


class RunningTotalProcessor(StatefulProcessor):
    """Per-key running sum + count in a ValueState (KeyValueStore twin).

    ``ttl_ms``: optional state TTL — the scale knob the old API lacks
    (idle keys expire from RocksDB instead of accumulating forever;
    at 100 TB of keys this is the difference between bounded and
    unbounded state).
    """

    def __init__(self, value_field: str = "value", ttl_ms: int | None = None):
        self._value_field = value_field
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("agg", _STATE_SCHEMA, ttlDurationMs=self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        total, n = 0.0, 0
        if self._state.exists():
            total, n = self._state.get()
        for pdf in rows:
            total += float(pdf[self._value_field].sum())
            n += int(len(pdf))
        self._state.update((total, n))
        yield pd.DataFrame({"key": [key[0]], "total": [total], "n": [n]})

    def close(self) -> None:
        pass


def require_rocksdb(spark) -> None:
    """transformWithState only runs on the RocksDB provider; set it on
    the session before the query starts (read per-query at start)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


def running_total_v2(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Update-mode running total on the transformWithState API.

    Identical output contract to ``processor.running_total_with_emission``
    (key, total, n) — the A2/A3 fold on typed RocksDB state.
    """
    require_rocksdb(stream.sparkSession)
    return (
        stream.groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalProcessor(value_col, ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
