"""Structured-Streaming throughput micro-bench for the stateful
pillars — latest-per-key (KTable), windowed stream-stream join, the
running-total processor, watermark-bounded dedup, and tumbling windowed
aggregation — so streaming perf regressions are visible round-to-round
(the main bench.py covers batch queries only).

Method: a deterministic synthetic event stream is pre-written as
parquet files (file source, 16 files, 4 files per trigger -> 4
micro-batches), each pipeline drains it via ``processAllAvailable``
into the noop sink, and throughput = input rows / wall seconds.
File-backed input measures the ENGINE (state store, shuffle, watermark
bookkeeping), not a generator's wall-clock rate the way a rate source
would.

Prints ONE JSON line:
  {"metric": "streaming_rows_per_sec", "value": <min over pipelines>,
   "unit": "rows/s", "pipelines": {name: rows_per_sec}, "rows": N}

Env knobs: SPARK_GRAFT_STREAM_ROWS (default 2_000_000),
SPARK_GRAFT_CPUS (session parallelism, as in bench.py).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import os

from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.session import get_spark
from confluent_kafka_streams_examples_spark.streaming.join import windowed_stream_join
from confluent_kafka_streams_examples_spark.streaming.ktable import latest_per_key_stream
from confluent_kafka_streams_examples_spark.streaming.processor import (
    running_total_with_emission,
)

N_ROWS = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "2000000"))
N_FILES = 16
SCHEMA = "key string, value double, ts timestamp"


def _gen(spark, path: str, n: int, offset_s: float = 0.0) -> None:
    """n synthetic events: 10k keys, event-time advancing 10k rows/s
    (so a ±5s join window holds ~100k rows of state per side)."""
    (
        spark.range(n)
        .select(
            F.concat(F.lit("k"), F.col("id") % 10000).alias("key"),
            (F.col("id") % 997).cast("double").alias("value"),
            F.timestamp_seconds(
                F.lit(1704067200.0) + F.col("id") / 10000.0 + F.lit(offset_s)
            ).alias("ts"),
        )
        .repartition(N_FILES)
        .write.mode("overwrite")
        .parquet(path)
    )


def _drain(spark, out, ckpt: str, mode: str) -> float:
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return time.perf_counter() - t0


def _read(spark, path: str):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", N_FILES // 4)
        .parquet(path)
    )


def main() -> None:
    spark = get_spark("ckse-bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ckse_stream_bench_")
    try:
        left_p, right_p = f"{root}/left", f"{root}/right"
        _gen(spark, left_p, N_ROWS)
        # right side shifted +1s: every row still inside the ±5s window
        _gen(spark, right_p, N_ROWS // 2, offset_s=1.0)

        # JVM/python-worker warmup on a small prefix so pipeline #1
        # isn't charged for first-use JIT
        warm = f"{root}/warm"
        _gen(spark, warm, 50_000)
        _drain(
            spark,
            latest_per_key_stream(_read(spark, warm), "key", "ts", ["value"]),
            f"{root}/ckpt_warm",
            "update",
        )

        results: dict[str, float] = {}

        out = latest_per_key_stream(_read(spark, left_p), "key", "ts", ["value"])
        took = _drain(spark, out, f"{root}/ckpt_ktable", "update")
        results["latest_per_key"] = round(N_ROWS / took)

        joined = windowed_stream_join(
            _read(spark, left_p), _read(spark, right_p), "key", "ts", "ts",
            window_seconds=5,
        ).select("key", "value", "r_value")
        took = _drain(spark, joined, f"{root}/ckpt_join", "append")
        results["windowed_join"] = round((N_ROWS + N_ROWS // 2) / took)

        # grace-window variant (ofTimeDifferenceAndGrace analog): the
        # +30s grace widens only the watermark delay — join state per
        # side grows from rate x 5s to rate x 35s, which is exactly the
        # cost being measured relative to the no-grace pipeline above
        joined_g = windowed_stream_join(
            _read(spark, left_p), _read(spark, right_p), "key", "ts", "ts",
            window_seconds=5, grace_seconds=30,
        ).select("key", "value", "r_value")
        took = _drain(spark, joined_g, f"{root}/ckpt_join_grace", "append")
        results["windowed_join_grace"] = round((N_ROWS + N_ROWS // 2) / took)

        totals = running_total_with_emission(_read(spark, left_p), "key", "value")
        took = _drain(spark, totals, f"{root}/ckpt_total", "update")
        results["running_total"] = round(N_ROWS / took)

        from confluent_kafka_streams_examples_spark.streaming.dedup import (
            dedup_within_watermark,
        )

        dd = dedup_within_watermark(
            _read(spark, left_p), ["key", "value"], "ts", delay="30 seconds"
        )
        took = _drain(spark, dd, f"{root}/ckpt_dedup", "append")
        results["dedup_within_watermark"] = round(N_ROWS / took)

        from confluent_kafka_streams_examples_spark.operators.windows import tumbling_agg

        ta = tumbling_agg(
            _read(spark, left_p).withWatermark("ts", "10 seconds"),
            "ts",
            "10 seconds",
            ["key"],
            F.sum("value").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        took = _drain(spark, ta, f"{root}/ckpt_tumbling", "append")
        results["tumbling_agg"] = round(N_ROWS / took)

        print(
            json.dumps(
                {
                    "metric": "streaming_rows_per_sec",
                    "value": min(results.values()),
                    "unit": "rows/s",
                    "pipelines": results,
                    "rows": N_ROWS,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
