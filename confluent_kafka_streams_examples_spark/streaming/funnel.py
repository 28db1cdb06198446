"""Streaming ordered-funnel processor — the stateful twin of the batch
``funnel_conversion`` query (queries_extra.py).

Per-user state is three stage timestamps (epoch micros): the earliest
``view``, the earliest ``click`` STRICTLY AFTER that view, the earliest
``purchase`` STRICTLY AFTER that click — first-touch semantics, same as
the batch oracle.  State is three longs per user regardless of how many
events the user produces: O(users) state, the shape that survives a
billion-user stream (contrast with keeping per-type candidate sets,
which is O(events) until the watermark closes).

Ordering contract (documented, tested): the within-batch fold is a
VECTORIZED three-step min-cascade (t1 = min over views; t2 = min over
clicks > t1_new, t2_old staying valid because t1 only decreases; t3
likewise) — provably identical to iterating the batch's rows in
event-time order, because a click is admitted iff SOME view precedes
it, i.e. iff the batch-global t1 precedes it (same argument one stage
down for purchases).  So arrival order within a batch never matters,
and any replay whose BATCHES arrive in event-time order reproduces the
batch query exactly (`tests/test_streaming_funnel.py` asserts this).
Across
out-of-order batches the fold is CONSERVATIVE: a late-arriving earlier
``view`` may lower stage-1 time, but clicks already rejected against
the old stage-1 time are not re-admitted (they were not retained) — a
stage is never reported EARLIER than exact, and never reported when the
exact cascade would not have fired... with one documented exception:
a stage time already accepted is kept even if the preceding stage's
time later moves below it (monotone refinement, Kafka-Streams-style
at-arrival semantics).  Exactness under arbitrary disorder requires
retaining all per-type timestamps until the watermark — the O(events)
trade this operator deliberately refuses; run the batch query over the
stored stream for the audited number (the lambda-architecture split
the reference's own examples assume: ProcessorApiExample.scala:34-72
folds at-arrival too).

Reference analog: per-key KeyValueStore fold + downstream forward
(ProcessorApiExample.scala:60-67); the stage cascade generalizes the
single running value to a small state machine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("t1", LongType()),
        StructField("t2", LongType()),
        StructField("t3", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)

_STAGES = ("view", "click", "purchase")


def funnel_stage_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Update-mode stream of (user_id, stage, t1_us, t2_us, t3_us):
    one row per user per micro-batch in which the user's funnel state
    CHANGED (stage advanced or a stage time refined).  ``stage`` is the
    deepest stage reached (1..3); users with no qualifying view emit
    nothing."""
    src = stream.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("etype"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    ).filter(
        F.col("etype").isin(*_STAGES)
        & F.col("ts_us").isNotNull()
        & F.col("user_id").isNotNull()
    )
    # the null-ts filter keeps NaN out of the Arrow batches: a null
    # timestamp would otherwise float the ts_us column and make an
    # all-null chunk raise on int(min); SQL min() ignores nulls, so
    # dropping them matches the batch oracle's semantics exactly.
    # The null-USER filter is a poison guard: groupBy(null) delivers
    # key (None,) and int(None) would kill the whole StreamingQuery —
    # one malformed record must never take down every user's funnel
    # (E1 posture; a null user has no funnel identity to track anyway)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t1, t2, t3 = state.get if state.exists else (None, None, None)
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        ts, et = pdf["ts_us"], pdf["etype"]

        def _min(prev: int | None, series: pd.Series) -> int | None:
            if len(series):
                m = int(series.min())
                return m if prev is None or m < prev else prev
            return prev

        # vectorized min-cascade == event-time-ordered fold (see module
        # docstring); t2_old/t3_old stay valid because t1/t2 only decrease
        n1 = _min(t1, ts[et == "view"])
        n2 = _min(t2, ts[(et == "click") & (ts > n1)]) if n1 is not None else t2
        n3 = _min(t3, ts[(et == "purchase") & (ts > n2)]) if n2 is not None else t3
        changed = (n1, n2, n3) != (t1, t2, t3)
        t1, t2, t3 = n1, n2, n3
        if changed:
            state.update((t1, t2, t3))
            stage = 3 if t3 is not None else (2 if t2 is not None else 1)
            # every column dtype pinned: pandas infers object for
            # all-NA plain lists, and concat across yielded frames
            # then warns (and will someday change dtypes) — explicit
            # Int64 keeps the Arrow schema stable whatever the mix
            yield pd.DataFrame(
                {
                    "user_id": pd.array([int(key[0])], dtype="Int64"),
                    "stage": pd.array([stage], dtype="Int64"),
                    "t1_us": pd.array([t1], dtype="Int64"),
                    "t2_us": pd.array([t2], dtype="Int64"),
                    "t3_us": pd.array([t3], dtype="Int64"),
                }
            )

    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bench_stream_to_funnel_columns(src: DataFrame) -> DataFrame:
    """Map the synthetic bench stream (key 'k<N>', value, ts) onto the
    funnel's input columns: user from the key suffix, event_type
    cycling view/click/purchase from the value — shared by
    bench_streaming.py and scripts/stream_state_probe.py so the two
    harnesses measure the identical pipeline."""
    return src.select(
        F.expr("CAST(substring(key, 2) AS LONG)").alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value").cast("long") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("ts"),
    )
