"""KTable analog: latest-value-per-key changelog view.

The reference's KTable (builder.table + Materialized store, reference
KTableExample.scala:52-56) reads a log-compacted topic as an upsert view:
the latest record per key wins.  Batch equivalent: window dedup —
``row_number() over (partition by key order by ts desc) = 1``.  The
streaming twin (stateful latest-per-key) lives in streaming.ktable.

Scale: the window dedup is a single shuffle on the key with no data
explosion; for very hot keys, AQE skew handling applies.  Equivalent
``max_by`` formulation is provided for aggregate-pushdown-friendly plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Latest record per key — the KTable materialization.

    ``tiebreak_cols`` break equal-timestamp ties deterministically (the
    reference has per-partition Kafka offset order; parquet has no offsets,
    so callers pass a monotonically increasing id column).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class Table:
    """Changelog-table view (reference KTable).  Operators mirror §2.2's
    table flavors: filter (P2), mapValues (P4), toStream (P7)."""

    def __init__(self, df: DataFrame, key_col: str):
        self.df = df
        self.key_col = key_col

    @classmethod
    def from_stream(
        cls,
        df: DataFrame,
        key_col: str,
        ts_col: str,
        tiebreak_cols: list[str] | None = None,
    ) -> "Table":
        """builder.table(topic): materialize the latest-per-key view
        (reference KTableExample.scala:52-56)."""
        return cls(latest_per_key(df, [key_col], ts_col, tiebreak_cols), key_col)

    def filter(self, predicate: Column | str) -> "Table":
        """P2 — table filter; in changelog terms a dropped row is a
        tombstone (reference KTableExample.scala:59,61)."""
        return Table(self.df.filter(predicate), self.key_col)

    def map_values(self, **named: Column) -> "Table":
        """P4 — value transform over the changelog view
        (reference KTableExample.scala:60)."""
        df = self.df
        for name, expr in named.items():
            df = df.withColumn(name, expr)
        return Table(df, self.key_col)

    def join(self, other: "Table", how: str = "inner") -> "Table":
        """Table-table equi-join on the key (KTable-KTable join — not
        exercised by the reference but part of the KTable API family):
        both sides are already latest-per-key views, so the result is
        the latest-joined changelog."""
        renamed = other.df.select(
            [
                F.col(c).alias(self.key_col if c == other.key_col else f"r_{c}")
                for c in other.df.columns
            ]
        )
        return Table(self.df.join(renamed, on=self.key_col, how=how), self.key_col)

    def to_stream(self):
        """P7 — changelog -> event stream (reference KTableExample.scala:62).
        In batch the latest-per-key view IS the stream of current values;
        in streaming this is the update-output-mode switch
        (streaming.ktable)."""
        from confluent_kafka_streams_examples_spark.operators.stream import Stream

        return Stream(self.df, key_col=self.key_col)

    def to_df(self) -> DataFrame:
        return self.df
