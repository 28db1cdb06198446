"""Replay-safe (effectively exactly-once) batch sinks for foreachBatch.

The reference gets end-to-end exactly-once from Kafka transactions
(``processing.guarantee=exactly_once_v2``; broker provisioned with
transaction support, docker-compose.yml:27-28).  Spark's offset
checkpoint already guarantees each micro-batch is DEFINED exactly once;
what can still duplicate output is a non-transactional sink receiving
the same batch twice when the query restarts between "sink wrote" and
"checkpoint committed".  The open-source answer for file sinks is
idempotent re-execution: key every write by the micro-batch epoch and
make re-running the epoch overwrite its own output instead of
appending next to it.

    query = (df.writeStream
               .foreachBatch(idempotent_parquet_sink(out_dir))
               .option("checkpointLocation", ckpt)
               .start())

On replay of epoch N the sink rewrites ``batch_id=N`` in place; readers
see each input row's effect exactly once.  (Kafka's transactional
producer equivalent stays environment-gated with the rest of the Kafka
surface, sources/kafka.py.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink writing each epoch to its own overwritten
    partition directory — replaying a batch after a crash between sink
    write and checkpoint commit rewrites the same files, never appends
    duplicates.

    The layout doubles as a partitioned table (``batch_id=N/`` dirs), so
    downstream readers can load the whole output with
    ``spark.read.parquet(path)`` and still prune by batch."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={epoch_id}")

    return sink
