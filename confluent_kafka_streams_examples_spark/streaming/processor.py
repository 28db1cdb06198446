"""Processor-API parity: custom stateful fold + timed emission.

Reference ProcessorApiExample.scala:34-72 hand-rolls a per-key running
total in a persistent KeyValueStore (process(): read store, add price,
put back — :60-67) and a *punctuator* that every 10s of stream time
scans the store and forwards every (key, total) downstream (:43-58).

Spark twin: ``applyInPandasWithState`` — the state store replaces the
KeyValueStore (checkpointed, per-key, partition-parallel), and emission
happens when a micro-batch touches a key (update semantics) or when the
configured timeout fires (punctuate semantics).

Documented mapping (SURVEY §7 M5): Kafka Streams punctuates on *stream
time advance*; Spark fires ``GroupStateTimeout`` when the watermark (event
-time timeout) or wall clock (processing-time timeout) passes the set
timestamp.  Emission cadence therefore quantizes to micro-batch
boundaries — same totals, same keys, trigger-aligned timing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

STATE_SCHEMA = StructType(
    [StructField("total", DoubleType()), StructField("n", LongType())]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total", DoubleType()),
        StructField("n", LongType()),
    ]
)


def running_total_with_emission(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    emit_every_ms: int | None = None,
) -> DataFrame:
    """Per-key running sum with optional periodic re-emission.

    - Each micro-batch: fold new rows into state, emit updated totals
      (A2/A3 continuous-refinement semantics).
    - ``emit_every_ms``: also re-emit every key's current total on a
      processing-time timeout — the punctuator (A4) analog.

    Returns an update-mode streaming DataFrame (key, total, n).

    CAUTION: with ``emit_every_ms`` set, armed timers continuously
    schedule micro-batches, so ``query.processAllAvailable()`` never
    settles — drive such queries with sink polling or awaitTermination
    (see tests/test_examples.py::test_processor_pipeline_punctuate_reemission).
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            total, n = state.get
        else:
            total, n = 0.0, 0
        saw_data = False
        for pdf in pdfs:
            if len(pdf):
                saw_data = True
                total += float(pdf[value_col].sum())
                n += int(len(pdf))
        state.update((total, n))
        if emit_every_ms is not None:
            state.setTimeoutDuration(emit_every_ms)
        if saw_data or (state.hasTimedOut if emit_every_ms is not None else False):
            yield pd.DataFrame({"key": [str(key[0])], "total": [total], "n": [n]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if emit_every_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
