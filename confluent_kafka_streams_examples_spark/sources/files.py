"""File-based streaming source — the broker-free streaming test path.

Structured Streaming treats a directory of parquet/json files as an
unbounded source (new files = new micro-batches).  Tests re-create the
reference's seeded generators (SURVEY.md §5) as staged file drops to
exercise watermarks, late data, and stateful ops without Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
