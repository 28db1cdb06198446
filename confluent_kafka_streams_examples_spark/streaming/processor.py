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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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

    Null-key records are DROPPED before the fold — the reference
    semantics: Kafka Streams' groupByKey discards null-key records
    ahead of any aggregation (KGroupedStream contract;
    AggregationsExample.scala's groupBy upstream of :36-44), and the
    JVM-side filter keeps the guarantee identical between this per-key
    variant and :func:`running_total_bucketed` (whose pandas groupby
    would otherwise silently drop them on its own — ADVICE r9).

    CAUTION: with ``emit_every_ms`` set, armed timers continuously
    schedule micro-batches, so ``query.processAllAvailable()`` never
    settles — drive such queries with sink polling or awaitTermination
    (see tests/test_examples.py::test_processor_pipeline_punctuate_reemission).
    """
    stream = stream.filter(F.col(key_col).isNotNull())

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


# ---------------------------------------------------------------------------
# Bucketed variant — the high-key-cardinality fast path (VERDICT r8 #1).
#
# Per-key grouping pays one Python fold invocation per touched key per
# micro-batch (~2 ms of pandas + marshalling each): the measured
# 32k -> 11k rows/s cliff from 10k to 1M keys (SCALE.md state decades).
# Here the state key is pmod(xxhash64(key), n_buckets) and the state
# value is ONE pickled dict {key: (total, n)} for every key in the
# bucket, so the per-call overhead amortizes across all of them and
# emission is one wide frame per bucket.  Python calls per batch are
# bounded by n_buckets regardless of key cardinality.
#
# Sizing at scale: ~60 bytes/key pickled => a 1k-key bucket is a
# ~60 KB RocksDB value, rewritten per touched bucket per batch; pick
# n_buckets ~ keys / 1000 to hold that constant (same rule as
# funnel_stage_stream_bucketed — see streaming/funnel.py for the full
# rationale).
#
# The punctuator (emit_every_ms) rides the SAME bucket blob (VERDICT
# r9 #3): each key's NEXT-FIRE time is stored alongside its total, the
# bucket's single processing-time timeout is armed at the MIN next-fire
# across its keys, and a firing (or any data batch) re-emits exactly
# the keys that are DUE — per-key cadence preserved (each key re-emits
# emit_every_ms after its own last activity, independent of bucket
# siblings), Python invocations still bounded by n_buckets.  A naive
# bucket-level timeout that re-emitted whole buckets would change A4's
# per-key cadence contract; emitting only due keys does not.
#
# Reference analog unchanged: per-key KeyValueStore fold + punctuator
# (ProcessorApiExample.scala:43-67); a bucket is the store partition
# made explicit.
# ---------------------------------------------------------------------------

BUCKET_STATE_SCHEMA = StructType([StructField("blob", BinaryType())])


def running_total_bucketed(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    n_buckets: int = 1024,
    emit_every_ms: int | None = None,
) -> DataFrame:
    """Per-key running sum with per-BUCKET state: identical update-mode
    (key, total, n) output to :func:`running_total_with_emission`,
    vectorized across every key in a hash bucket per micro-batch.

    ``emit_every_ms`` is the punctuator (A4) at bucket granularity
    with PER-KEY cadence: every key's next-fire time lives in the
    bucket blob, the bucket's one processing-time timeout is armed at
    the min next-fire of its keys, and a firing re-emits only the keys
    that are due (then re-arms them) — so each key re-emits
    emit_every_ms after its own last activity exactly as the per-key
    punctuator does, while Python invocations per trigger stay bounded
    by n_buckets regardless of key cardinality.

    Null keys are dropped JVM-side before bucketing — the same
    groupByKey null-drop guard as the per-key variant (reference
    semantics), made EXPLICIT here because the pandas groupby inside
    the fold would otherwise drop them silently (dropna default) while
    claiming output parity.

    CAUTION (same as the per-key variant): an armed processing-time
    timeout continuously schedules micro-batches, so
    ``processAllAvailable()`` never settles — poll the sink instead.

    Toggling ``emit_every_ms`` between None and set requires a FRESH
    checkpoint: the timeout adds an internal state column
    (timeoutTimestamp), so Spark rejects recovery at state load with a
    clear incompatibility error (pytest-pinned).  Defensively, the fold
    also upgrades any legacy 2-tuple (total, n) entries to
    (total, n, next_fire) before reading next-fire times."""
    import pickle

    stream = stream.filter(F.col(key_col).isNotNull())
    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("key"), F.lit(n_buckets)).cast("long")
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        timed_out = (
            state.hasTimedOut if emit_every_ms is not None else False
        )
        if not chunks and not timed_out:
            return
        now = (
            state.getCurrentProcessingTimeMs()
            if emit_every_ms is not None
            else 0
        )
        # entry = (total, n) plain mode; (total, n, next_fire_ms) with
        # the punctuator — the fire time is state, so it survives
        # checkpoint recovery like everything else in the blob
        totals: dict[str, tuple] = (
            pickle.loads(state.get[0]) if state.exists else {}
        )
        if emit_every_ms is not None and totals:
            # a checkpoint written in plain mode holds 2-tuples; when the
            # punctuator is newly enabled on restart, upgrade them in
            # place (first fire one full period from now) instead of
            # raising IndexError on rec[2] below
            totals = {
                k: rec if len(rec) > 2 else (rec[0], rec[1], now + emit_every_ms)
                for k, rec in totals.items()
            }
        out_k: list[str] = []
        out_t: list[float] = []
        out_n: list[int] = []
        emitted: set[str] = set()
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            # one C-level groupby over the bucket's rows, then a Python
            # loop over TOUCHED keys only (~rows/n_buckets per call)
            g = pdf.groupby("key", sort=False)["value"].agg(["sum", "size"])
            for k, s, c in zip(
                g.index, g["sum"].to_numpy(), g["size"].to_numpy()
            ):
                rec = totals.get(k)
                total, n = (rec[0], rec[1]) if rec else (0.0, 0)
                total += float(s)
                n += int(c)
                totals[k] = (
                    (total, n)
                    if emit_every_ms is None
                    else (total, n, now + emit_every_ms)
                )
                emitted.add(k)
                out_k.append(k)
                out_t.append(total)
                out_n.append(n)
        if emit_every_ms is not None:
            # due keys re-emit their CURRENT total (punctuate), whether
            # this invocation carried data for bucket siblings or the
            # bucket's timer fired with no data at all
            for k, rec in totals.items():
                if k not in emitted and rec[2] <= now:
                    totals[k] = (rec[0], rec[1], now + emit_every_ms)
                    out_k.append(k)
                    out_t.append(rec[0])
                    out_n.append(rec[1])
        state.update((pickle.dumps(totals, protocol=pickle.HIGHEST_PROTOCOL),))
        if emit_every_ms is not None and totals:
            next_fire = min(rec[2] for rec in totals.values())
            state.setTimeoutDuration(max(1, int(next_fire - now)))
        if out_k:
            yield pd.DataFrame({"key": out_k, "total": out_t, "n": out_n})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if emit_every_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("bucket").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
