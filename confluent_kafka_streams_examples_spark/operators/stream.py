"""KStream analog: a thin, zero-cost wrapper over DataFrame.

The reference's KStream (builder.stream, reference BasicStreams.scala:52)
is an unbounded append-only event stream with per-record operators.  Here
every operator delegates straight to the DataFrame API so Catalyst sees
one declarative plan — the wrapper adds parity naming, never execution.

Works identically over batch DataFrames (correctness substrate) and
streaming DataFrames (``spark.readStream``): the DataFrame API is the
same; only sinks differ (see sources/ and streaming/).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.functions.scalar import epoch_us

ColumnLike = Union[Column, str]


class Stream:
    """Event-stream view of a DataFrame (reference KStream).

    ``key_col``/``ts_col`` name the logical record key and event-time
    column — the analog of the Kafka record key and timestamp that the
    reference's operators act on implicitly.
    """

    def __init__(self, df: DataFrame, key_col: str | None = None, ts_col: str | None = None):
        self.df = df
        self.key_col = key_col
        self.ts_col = ts_col

    def _wrap(self, df: DataFrame) -> "Stream":
        return Stream(df, self.key_col, self.ts_col)

    # -- §2.2 stateless operators -----------------------------------------

    def filter(self, predicate: ColumnLike) -> "Stream":
        """P1 — keep records where predicate holds
        (reference KStream.filter, BasicStreams.scala:56,58)."""
        return self._wrap(self.df.filter(predicate))

    where = filter

    def map_values(self, *cols: Column, **named: Column) -> "Stream":
        """P3 — transform values, keep key (reference KStream.mapValues,
        BasicStreams.scala:57).  Accepts replacement columns and/or
        ``name=expr`` pairs added via withColumn — no shuffle either way,
        exactly like mapValues never repartitions."""
        df = self.df
        if cols:
            keep = [F.col(self.key_col)] if self.key_col else []
            if self.ts_col:
                keep.append(F.col(self.ts_col))
            df = df.select(*keep, *cols)
        for name, expr in named.items():
            df = df.withColumn(name, expr)
        return self._wrap(df)

    def select(self, *cols: ColumnLike) -> "Stream":
        return self._wrap(self.df.select(*cols))

    def peek(self, fn: Callable[..., None] | None = None, n: int = 5) -> "Stream":
        """P6 — side-effecting observe, pass-through (reference
        KStream.peek, BasicStreams.scala:55,59).  Debug-only: shows a
        sample without disturbing the plan.  In streaming use
        ``foreachBatch`` (streaming.lifecycle)."""
        if fn is not None:
            for row in self.df.limit(n).collect():  # debug path only — never in operator chains
                fn(row)
        else:
            self.df.show(n, truncate=False)
        return self

    # -- §2.3 joins (batch semantics; streaming variants in streaming/) ---

    def join_windowed(
        self,
        other: "Stream",
        on: str | Column,
        window_seconds: float,
        select: list[Column] | None = None,
        how: str = "inner",
    ) -> "Stream":
        """J1 — stream-stream windowed equi-join: records match when keys
        are equal AND |ts_left - ts_right| <= window (reference
        JoinWindows.ofTimeDifferenceWithNoGrace(5s) + join,
        JoinsExample.scala:47-56).

        Batch semantics of the no-grace window: plain equi-join + absolute
        time-range predicate.  The streaming twin (watermarked interval
        join) lives in streaming.join.  Scale: the equi-key condition makes
        this a shuffle hash / sort-merge join on the key — never a range-only
        cross join; AQE handles skewed keys.
        """
        left, right = self.df.alias("l"), other.df.alias("r")
        lts, rts = F.col(f"l.{self.ts_col}"), F.col(f"r.{other.ts_col}")
        # integer-microsecond time arithmetic (engine-wide convention:
        # no float time, no boundary jitter)
        window_us = int(window_seconds * 1_000_000)
        cond = (
            (F.col(f"l.{on}") == F.col(f"r.{on}")) if isinstance(on, str) else on
        ) & (F.abs(epoch_us(lts) - epoch_us(rts)) <= F.lit(window_us))
        joined = left.join(right, cond, how)
        if select is not None:
            joined = joined.select(*select)
        return Stream(joined, self.key_col, self.ts_col)

    def join_table(
        self,
        table: "DataFrame",
        on: ColumnLike | list,
        how: str = "inner",
        broadcast_table: bool = False,
    ) -> "Stream":
        """J2 — stream-table enrichment join (reference declares the
        domain at JoinsExample.scala:41-45,274-286; the course leaves the
        call as the implied next step).  ``table`` is typically a
        latest-per-key view (operators.table) or a static dimension.

        Scale: pass ``broadcast_table=True`` for dimension-sized tables to
        avoid shuffling the (large) stream side.
        """
        t = F.broadcast(table) if broadcast_table else table
        return self._wrap(self.df.join(t, on, how))

    # -- §2.4 grouping ----------------------------------------------------

    def group_by_key(self) -> "GroupedStream":
        """A1 — group by the record key (reference KStream.groupByKey,
        AggregationsExample.scala:35).  No eager shuffle: Catalyst plans
        a partial (map-side) aggregate before the exchange."""
        if not self.key_col:
            raise ValueError("group_by_key requires key_col")
        return GroupedStream(self, [self.key_col])

    def group_by(self, *cols: ColumnLike) -> "GroupedStream":
        return GroupedStream(self, list(cols))

    # -- sink --------------------------------------------------------------

    def to_df(self) -> DataFrame:
        return self.df


class GroupedStream:
    """Reference KGroupedStream: the target of aggregate/count/reduce."""

    def __init__(self, stream: Stream, keys: list):
        self.stream = stream
        self.keys = keys

    def aggregate(self, *aggs: Column) -> "Stream":
        """A2 — per-key fold (reference KGroupedStream.aggregate,
        AggregationsExample.scala:36-38).  Batch result = the final
        running total per key; the continuous-refinement (emit per input
        record) variant is the streaming update-mode query in
        streaming.processor."""
        return Stream(self.stream.df.groupBy(*self.keys).agg(*aggs), key_col=None)

    def count(self, alias: str = "count") -> "Stream":
        return self.aggregate(F.count(F.lit(1)).alias(alias))

    def reduce_sum(self, col: ColumnLike, alias: str = "total") -> "Stream":
        """The reference's only concrete fold: running price sum
        (AggregationsExample.scala:37: (k, order, total) => order.price + total)."""
        return self.aggregate(F.sum(col).alias(alias))
