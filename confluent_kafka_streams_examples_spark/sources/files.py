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


def batch_read(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    fmt: str = "parquet",
    *,
    header: bool = True,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Batch file source for parquet / orc / csv / json(l).

    Always pass an explicit ``schema`` for csv/json in production:
    schema inference is a full extra pass over the data (fatal at
    100 TB) and infers types from whatever happens to be in the sample.

    ``mode``: Spark's malformed-record policy for csv/json —
    PERMISSIVE (null out bad fields; capture the raw line in
    ``corrupt_col`` if given), DROPMALFORMED, or FAILFAST.  This is the
    batch twin of the streaming dead-letter policy (E1/E4,
    reference ErrorHandlingExample.scala:32-47): same
    skip/collect/fail triad, expressed as reader options.
    """
    if fmt in ("parquet", "orc"):
        # both are self-describing columnar formats: schema optional,
        # no malformed-record policy (corruption is a read error, not a
        # row-level event), predicate pushdown + column pruning apply
        reader = spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read.format(fmt).option("mode", mode)
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
    if schema is not None:
        if corrupt_col is not None:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                list(schema.fields) + [StructField(corrupt_col, StringType())]
            )
            reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        reader = reader.schema(schema)
    return reader.load(path)
