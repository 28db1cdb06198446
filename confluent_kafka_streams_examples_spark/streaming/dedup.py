"""Streaming deduplication — exactly-once event delivery on top of an
at-least-once source.

The reference gets effective dedup from Kafka's exactly-once-v2
transactions (KafkaStreamsApp wiring); a file/object-store pipeline
instead sees re-delivered records (retried producers, replayed
batches).  Two Spark-native forms:

- ``dedup_exact_keys``: ``dropDuplicates(keys)`` — state holds every
  key seen since the query started.  Correct but unbounded: only for
  bounded key spaces.
- ``dedup_within_watermark``: ``dropDuplicatesWithinWatermark`` —
  state is EVICTED once the watermark passes a key's event time, so
  per-key state lives only ``delay`` long.  This is the 100 TB default:
  duplicates in stream processing are overwhelmingly near-in-time
  (producer retries), so a bounded horizon buys bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact_keys(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Unbounded-state exact dedup (bounded key spaces only)."""
    return stream.dropDuplicates(keys)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermark-bounded dedup: a duplicate arriving within ``delay`` of
    the original's event time is dropped; state for older keys is
    evicted.  ``ts_col`` must be the event-time column the watermark is
    defined on (it need NOT be part of ``keys`` — that is the point of
    the WithinWatermark variant: re-deliveries with a different
    ingest timestamp still dedup on the business key)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
