"""Streaming KTable: latest-value-per-key over an unbounded stream.

The reference's KTable (builder.table over a compacted topic, reference
KTableExample.scala:52-56) continuously upserts the newest value per key.
Streaming twin: a stateful aggregation in *update* output mode — each
micro-batch emits the keys whose latest value changed, which is exactly
the KTable changelog (`toStream`, KTableExample.scala:62).

``max_by`` keeps the whole-row-latest semantics in one aggregation (no
join-back), state is one row per key (bounded by key cardinality, spill
to the state store; RocksDB provider for 100 TB key spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    watermark: str | None = None,
) -> DataFrame:
    """Continuously-updating latest-per-key view of a streaming DataFrame.

    Use with ``writeStream.outputMode("update")`` for changelog emission
    (P7 toStream parity) or ``"complete"`` for the full table.

    ``watermark`` (e.g. "10 seconds") bounds how late an update may
    arrive; without it state is kept forever (matches the reference,
    whose compacted topic also never expires keys).
    """
    if watermark:
        stream = stream.withWatermark(ts_col, watermark)
    # order latest-first by (ts, value...) tuple via max_by on a struct:
    # single stateful agg, one row of state per key
    ordering = F.struct(F.col(ts_col), *[F.col(c) for c in value_cols])
    aggs = [
        F.max_by(F.col(c), ordering).alias(c) for c in [ts_col, *value_cols]
    ]
    return stream.groupBy(key_col).agg(*aggs)
