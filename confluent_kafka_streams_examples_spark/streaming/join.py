"""Streaming stream-stream windowed join (J1/W1/W2).

Reference: JoinsExample.scala:47-56 — inner equi-join where records match
when timestamps are within ±window, zero grace (late records silently
dropped; the example's producer deliberately sends half the right side
late to demonstrate it, JoinsExample.scala:150,176-178).

Spark twin: watermarks on BOTH sides + an interval join condition.
Spark uses the watermark to expire join state, so state per side is
bounded by (rate x (window + grace)) rows regardless of total stream
length.

Window bound and grace are SEPARATE knobs, exactly as in the
reference's JoinWindows API: ``window_seconds`` is the match predicate
(|l.ts - r.ts| <= window), ``grace_seconds`` extends only the
watermark delay — how long a late record may still arrive and join —
without widening what matches.  ``grace_seconds=0`` is
``ofTimeDifferenceWithNoGrace`` (the example's choice); nonzero is the
``ofTimeDifferenceAndGrace`` analog
(tests/test_streaming.py::test_windowed_join_grace_admits_late_within_grace:
late-but-within-grace joins, beyond-grace drops, and the no-grace twin
drops both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    grace_seconds: int = 0,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on key where |left_ts - right_ts| <= window.

    ``grace_seconds`` extends the watermark beyond the join window
    (the reference uses ofTimeDifferenceWithNoGrace => 0).  The right
    side's columns are prefixed ``r_`` to avoid collisions.
    """
    delay = f"{window_seconds + grace_seconds} seconds"
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay)
    rw = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns]).alias("r")
    # The range condition stays on the raw TimestampType columns with
    # INTERVAL arithmetic: microsecond-exact (cast("long") truncates to
    # whole seconds and admits records up to ~1s outside the window —
    # the reference's JoinWindows are millisecond-exact) AND in the
    # shape Spark's state-watermark analyzer recognizes, so join state
    # is still evicted by the watermark.
    win = F.expr(f"INTERVAL {window_seconds} SECONDS")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.r_{right_ts}")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.r_{key_col}"))
        & (lt >= rt - win)
        & (lt <= rt + win)
    )
    return lw.join(rw, cond, how)
